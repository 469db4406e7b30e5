import sys; import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import __spark_entry__ as e
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions","8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pdf = e.ts_fixture_fit_kernels(spark, "/root/testdata/sf0.001").toPandas()
import math
names = ["series_id"] + [f for f,_ in e._FIXTURE_FIELDS]
print("COLUMNS:", names)
for _, row in pdf.sort_values("series_id").iterrows():
    vals = []
    for f in names:
        v = row[f]
        if f == "series_id":
            vals.append(f"'{v}'")
        elif v is None or (isinstance(v, float) and math.isnan(v)):
            vals.append("cast(null as double)")
        else:
            vals.append(f"{v!r}::double")
    print("(" + ", ".join(vals) + "),")
spark.stop()
