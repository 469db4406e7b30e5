"""tsfeatures_spark — a from-scratch PySpark-native time-series
rollup/downsample/retention engine with the feature semantics of
Nixtla/tsfeatures (reference at /root/reference, studied for behaviour only).

Layers:
- ``kernels``     pure-NumPy feature kernels + numerical primitives
- ``functions``   SQL-native (Catalyst) Column expressions for features
- ``operators``   Spark operators: feature extraction, tier rollup, gap-fill,
                  dedup, similarity, text analysis, multimodal plumbing
- ``metrics``     forecast-evaluation metrics (SQL-native)
- ``compression`` Gorilla XOR / delta-of-delta block codecs (NumPy)
- ``sources``     deterministic token-table generator + Iceberg-lite catalog
- ``plans``       tier-cascade planner, lineage/resume
"""

__version__ = "0.1.0"
