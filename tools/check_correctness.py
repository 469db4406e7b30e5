"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, schema (column names), and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        return problems
    for c in sdf.columns:
        a, b = sdf[c].dtype, odf[c].dtype
        # flag raw dtype families that differ (int vs float vs object) —
        # the driver's schema check may be stricter than value compare
        fam = lambda d: ("f" if np.issubdtype(d, np.floating) else
                         "i" if np.issubdtype(d, np.integer) else "o")
        if fam(a) != fam(b):
            problems.append(f"dtype family {c}: spark {a} vs oracle {b}")
    a, b = _canon(sdf), _canon(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(a[c].dtype, np.floating):
                ok = np.allclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = (av == bv).all()
            if not ok:
                bad = np.flatnonzero(~(av == bv) if not np.issubdtype(a[c].dtype, np.floating)
                                     else ~np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True))[:3]
                problems.append(f"col {c}: {len(bad)}+ diffs, e.g. {[(av[i], bv[i]) for i in bad]}")
    return problems


def _record(sdf, odf, problems) -> dict:
    """Driver-format row: rows/schema/hash match booleans per problem class."""
    return {
        "rows_match": not any(p.startswith("row count") for p in problems),
        "schema_match": not any(p.startswith(("columns", "dtype")) for p in problems),
        "hash_match": not problems,
        "spark_rows": int(len(sdf)),
        "oracle_rows": int(len(odf)),
        "err": None,
    }


def main():
    bad = [a for a in sys.argv[1:]
           if a.startswith("--json") and not a.startswith("--json=")]
    if bad:
        sys.exit("check_correctness: use --json=PATH (bare --json would "
                 "silently skip the artifact and eat the next argument)")
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--json=")), None)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    records: dict[str, dict] = {}
    from tsfeatures_spark.session import get_spark

    spark = get_spark("correctness", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0, "oracle_rows": 0,
                             "err": f"spark: {type(e).__name__}: {str(e)[:200]}"}
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows in {el:.1f}s (rows-only)")
            records[name] = {"rows_match": True, "schema_match": True,
                             "hash_match": None, "spark_rows": int(len(sdf)),
                             "oracle_rows": None, "err": None}
            n_pass += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": int(len(sdf)),
                             "oracle_rows": 0,
                             "err": f"oracle: {type(e).__name__}: {str(e)[:200]}"}
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        records[name] = _record(sdf, odf, problems)
        if problems:
            print(f"FAIL {name} ({len(sdf)} rows, {el:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows in {el:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json as _json
        with open(json_out, "w") as f:
            _json.dump(records, f, indent=2)
        print(f"wrote {json_out} ({len(records)} queries)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
