"""Custom stateful streaming operators (applyInPandasWithState) and the
watermarked windowed-aggregate surface.

Two late-data regimes, matching the engine's data model:

- TOKEN docs are self-contained (a late doc is just a later micro-batch)
  — handled by ``stream_rollup.py`` with no state.
- EVENT panels are open-ended per key: running statistics must carry
  ACROSS micro-batches. ``running_stats_stream`` keeps one tiny algebraic
  state per key — (n, sum, M2, min, max) — and merges each micro-batch in
  with the numerically-stable two-pass Chan combine, the SAME algebra the
  batch tier cascade uses for 1m->1h->1d maintenance
  (operators/rollup.py::merge_algebraic). State is O(1) per key, so 10^9
  keys is a bounded state store, and the emitted rows at any point equal
  a from-scratch batch aggregate over everything seen (pinned by
  tests/test_operators.py).

``windowed_stats_stream`` is the native path: event-time tumbling windows
with a watermark for bounded late-data state — used when per-window (not
running) outputs are wanted.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, s double, m2 double, mn double, mx double"
OUT_SCHEMA = (
    "event_type string, n long, total_sum double, mean double, "
    "variance double, vmin double, vmax double"
)


def _merge_chan(a: Tuple[int, float, float, float, float],
                b: Tuple[int, float, float, float, float]):
    """Chan et al. combine of (n, sum, M2, min, max) states — exact for
    count/sum/min/max, numerically stable for the variance term."""
    na, sa, m2a, mna, mxa = a
    nb, sb, m2b, mnb, mxb = b
    if na == 0:
        return b
    if nb == 0:
        return a
    n = na + nb
    delta = sb / nb - sa / na
    m2 = m2a + m2b + delta * delta * na * nb / n
    return (n, sa + sb, m2, min(mna, mnb), max(mxa, mxb))


def _update_stats(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    cur = tuple(state.get) if state.exists else (0, 0.0, 0.0, float("inf"), float("-inf"))
    for pdf in pdfs:
        v = pdf["value"].to_numpy(dtype=float)
        if len(v) == 0:
            continue
        mean = float(v.mean())
        batch = (len(v), float(v.sum()), float(((v - mean) ** 2).sum()),
                 float(v.min()), float(v.max()))
        cur = _merge_chan(cur, batch)
    state.update(cur)
    n, s, m2, mn, mx = cur
    yield pd.DataFrame([{
        "event_type": key[0], "n": n, "total_sum": s,
        "mean": s / n if n else float("nan"),
        "variance": m2 / (n - 1) if n > 1 else float("nan"),
        "vmin": mn, "vmax": mx,
    }])


def running_stats_stream(events: DataFrame) -> DataFrame:
    """events stream (event_type, ts, value) -> per-key RUNNING statistics,
    one updated row per key per micro-batch it appears in."""
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_stats, OUT_SCHEMA, STATE_SCHEMA,
            outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_stats_stream(events: DataFrame, window: str = "1 minute",
                          watermark: str = "1 hour") -> DataFrame:
    """Native event-time tumbling windows with a watermark: state for a
    window is dropped once the watermark passes its end, bounding memory
    under unbounded late data."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_sum"),
            F.avg("value").alias("mean"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .select("event_type", F.col("w.start").alias("window_start"),
                "n", "total_sum", "mean", "vmin", "vmax")
    )
