"""Spark-native equivalents of the reference's two entry points
(tsfeatures / tsfeatures_wide, reference tsfeatures.py:930-976 / 1001-1039).

- ``features_wide``: one row = one whole series (our primary layout and the
  token table's shape) -> ``mapInPandas``: NO shuffle, no sort — the plan is
  Scan -> MapInPandas, vs the reference's one-process-task-per-series pool.
- ``features_long``: long panel (unique_id, ds, y) -> ``groupBy(id).
  applyInPandas``: one hash Exchange (unavoidable — rows of a series must
  meet), sort by ds inside the group, then the same kernel pass.

Output: one row per series, one nullable double column per feature field,
schema fixed at plan time from the kernel registry (SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from ..kernels import DEFAULT_FEATURES, compute_features, output_fields

# string-frequency -> seasonal period map (reference utils.py:15-17)
FREQS = {"H": 24, "D": 1, "M": 12, "Q": 4, "W": 1, "Y": 1}


def _schema(id_col: str, features: List[str]) -> str:
    fields = output_fields(features)
    return ", ".join([f"{id_col} string"] + [f"`{f}` double" for f in fields])


#: Kernels with a cross-series batched implementation (kernels/fit_batch.py):
#: grid fits whose per-series cost is numpy dispatch, not flops. Registry
#: fields are collision-free (asserted in tests), so merging their batched
#: results into the per-series dict is order-independent.
_BATCHED_FIT_KERNELS = ("holt_parameters", "hw_parameters", "heterogeneity")


def features_wide(
    df,
    features: Optional[List[str]] = None,
    scale: bool = True,
    id_col: str = "doc_id",
    value_col: str = "tokens",
    seasonality_col: Optional[str] = None,
    freq: int = 1,
    batch_rows: int = 256,
    batch_fits: bool = True,
):
    """Per-series features over a wide table (one row = one series).

    Parity: tsfeatures_wide (reference tsfeatures.py:1001-1039); seasonality
    is per-row when ``seasonality_col`` is given, else the ``freq`` literal
    (token series are fixed-interval by construction — SURVEY.md §1.1).

    ``batch_fits``: route the Holt / Holt-Winters grid fits through the
    cross-series batched kernels (kernels/fit_batch.py) — ~3x on the
    dispatch-bound fits, value-identical per series (pinned by
    tests/test_fit_batch.py and the Spark-path equality test). False runs
    every kernel per series (the reference-shaped path).
    """
    names = features if features is not None else DEFAULT_FEATURES
    fields = output_fields(names)
    schema = _schema(id_col, names)
    sel = [id_col, value_col] + ([seasonality_col] if seasonality_col else [])
    batched = [n for n in _BATCHED_FIT_KERNELS if batch_fits and n in names]
    rest = [n for n in names if n not in batched]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import warnings

        from ..kernels import stats as kstats
        from ..kernels.features import FEATURES
        if batched:
            from ..kernels.fit_batch import (
                heterogeneity_fit_batch, holt_fit_batch, hw_fit_batch,
            )

        warnings.filterwarnings("ignore")
        for pdf in batches:
            n_rows = len(pdf)
            # one scaling pass, shared by the per-series kernels and the
            # batched fits (identical to compute_features' scale=True)
            ys: list[np.ndarray] = []
            ms: list[int] = []
            for i in range(n_rows):
                y = np.asarray(pdf[value_col].iloc[i], dtype=float)
                if scale:
                    y = kstats.scalets(y)
                ys.append(y)
                ms.append(int(pdf[seasonality_col].iloc[i]) if seasonality_col else int(freq))
            vals_all = [compute_features(ys[i], ms[i], rest, scale=False)
                        for i in range(n_rows)]
            if "holt_parameters" in batched:
                hp = holt_fit_batch(ys)
                for i in range(n_rows):
                    vals_all[i]["alpha"] = float(hp[i, 0])
                    vals_all[i]["beta"] = float(hp[i, 1])
            if "hw_parameters" in batched:
                hw_fields = FEATURES["hw_parameters"][1]
                for m in sorted(set(ms)):
                    idx = [i for i in range(n_rows) if ms[i] == m]
                    hw = hw_fit_batch([ys[i] for i in idx], m)
                    for r, i in enumerate(idx):
                        for c, f in enumerate(hw_fields):
                            vals_all[i][f] = float(hw[r, c])
            if "heterogeneity" in batched:
                het_fields = FEATURES["heterogeneity"][1]
                for m in sorted(set(ms)):
                    idx = [i for i in range(n_rows) if ms[i] == m]
                    het = heterogeneity_fit_batch([ys[i] for i in idx], m)
                    for r, i in enumerate(idx):
                        for f in het_fields:
                            v = het[r].get(f, np.nan)
                            vals_all[i][f] = float(v) if v is not None else np.nan
            out_rows = []
            ids = []
            for i in range(n_rows):
                out_rows.append([vals_all[i].get(f, np.nan) for f in fields])
                ids.append(str(pdf[id_col].iloc[i]))
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame([[i_] + r for i_, r in zip(ids, out_rows)], columns=[id_col] + fields)
                    out_rows, ids = [], []
            if out_rows:
                yield pd.DataFrame([[i_] + r for i_, r in zip(ids, out_rows)], columns=[id_col] + fields)

    return df.select(*sel).mapInPandas(run, schema=schema)


def features_long(
    df,
    freq: Optional[int] = None,
    features: Optional[List[str]] = None,
    scale: bool = True,
    id_col: str = "unique_id",
    time_col: str = "ds",
    value_col: str = "y",
    dict_freqs: Optional[dict] = None,
):
    """Per-series features over a long panel (unique_id, ds, y).

    Parity: tsfeatures (reference tsfeatures.py:930-976). One shuffle on the
    series key; rows sorted by ``time_col`` inside each group (the reference
    assumes pre-sorted input; we make it explicit for determinism).

    ``freq=None`` infers each series' frequency from the ``ds`` timestamps
    via pd.infer_freq + the FREQS map and fails the task with the
    reference's error semantics when inference is impossible
    (tsfeatures.py:898-913).

    ``time_col`` may be a LIST of columns (r06): the rows are ordered by
    the composite key inside each group. A caller whose natural order is
    (timestamp, tie-break-id) can then skip materializing a dense rank
    first — the rank was a whole extra window Exchange+sort over the raw
    rows just to produce a single sortable column, when the kernel
    re-sorts in pandas anyway. Frequency inference (freq=None) uses the
    first column.
    """
    names = features if features is not None else DEFAULT_FEATURES
    fields = output_fields(names)
    schema = _schema(id_col, names)
    freqs_map = dict_freqs if dict_freqs is not None else FREQS
    tcols = [time_col] if isinstance(time_col, str) else list(time_col)

    # NOTE: deliberately un-annotated — with `from __future__ import
    # annotations` in scope, partial string hints make PySpark's eval-type
    # inference warn on every plan; hint-free signatures take the plain
    # applyInPandas path silently.
    def run(key, pdf):
        import warnings

        warnings.filterwarnings("ignore")
        pdf = pdf.sort_values(tcols)
        m = freq
        if m is None:
            inf = pd.infer_freq(pd.DatetimeIndex(pdf[tcols[0]]))
            if inf is None:
                raise ValueError(
                    "Failed to infer frequency from the `ds` column, "
                    "please provide the frequency using the `freq` argument."
                )
            m = freqs_map.get(inf[:1] if inf not in freqs_map else inf)
            if m is None:
                raise ValueError(
                    "Error trying to convert inferred frequency to integer; "
                    f"provide dict_freqs with key {inf!r}."
                )
        y = pdf[value_col].to_numpy(dtype=float)
        vals = compute_features(y, int(m), names, scale=scale)
        return pd.DataFrame([[str(key[0])] + [vals.get(f, np.nan) for f in fields]], columns=[id_col] + fields)

    return df.select(id_col, *tcols, value_col).groupBy(id_col).applyInPandas(run, schema=schema)
