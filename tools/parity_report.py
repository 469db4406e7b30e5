"""Generate docs/PARITY.md — every kernel's output on the two canonical
fixture series (WWWusage, USAccDeaths) with deltas against the reference's
published golden values, mirroring the reference's own compare_with_r
diff-table style (README.md:95-141). Pure NumPy, no Spark.

Usage: python tools/parity_report.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from tsfeatures_spark.kernels import FEATURES, compute_features  # noqa: E402
from tsfeatures_spark.kernels.fixtures import USAccDeaths, WWWusage  # noqa: E402

# (series, freq, feature_key) -> golden value & tolerance, from the
# reference's tests (FIXTURES.md §3)
GOLDEN = {
    ("usacc", "x_acf1"): (0.70, 0.01), ("usacc", "x_acf10"): (1.20, 0.01),
    ("usacc", "diff1_acf1"): (0.023, 0.01), ("usacc", "diff1_acf10"): (0.27, 0.01),
    ("usacc", "diff2_acf1"): (-0.48, 0.01), ("usacc", "diff2_acf10"): (0.74, 0.01),
    ("usacc", "seas_acf1"): (0.62, 0.01), ("usacc", "arch_lm"): (0.54, 0.01),
    ("usacc", "alpha"): (0.96, 0.07), ("usacc", "beta"): (0.00, 0.1),
    ("www", "x_acf1"): (0.96, 0.01), ("www", "x_acf10"): (4.19, 0.01),
    ("www", "diff1_acf1"): (0.79, 0.01), ("www", "diff1_acf10"): (1.40, 0.01),
    ("www", "diff2_acf1"): (0.17, 0.01), ("www", "diff2_acf10"): (0.33, 0.01),
    ("www", "alpha"): (0.99, 0.02), ("www", "beta"): (0.99, 0.02),
}


def main() -> None:
    rows = []
    all_names = list(FEATURES)
    for label, series, freq in [("usacc", USAccDeaths, 12), ("www", WWWusage, 1)]:
        vals = compute_features(series, freq, all_names, scale=False)
        for k in sorted(vals):
            v = vals[k]
            g = GOLDEN.get((label, k))
            if g is not None:
                delta = abs(v - g[0])
                status = "OK" if delta <= g[1] else "DRIFT"
                rows.append((label, k, v, f"{g[0]} ±{g[1]}", f"{delta:.4f}", status))
            else:
                rows.append((label, k, v, "—", "—", ""))
    n_golden = sum(1 for r in rows if r[3] != "—")
    n_ok = sum(1 for r in rows if r[5] == "OK")
    lines = [
        "# PARITY — kernel outputs vs reference golden values",
        "",
        "All 23 kernels evaluated on the reference's two canonical fixture",
        "series (scale=False, direct kernel invocation — exactly how the",
        "reference's own golden tests call them). Golden values/tolerances",
        "are the reference's published test expectations; rows without a",
        "golden have no published value (the reference only pins a subset).",
        "",
        "Fit kernels without a published golden carry an INDEPENDENT",
        "contract instead: holt/hw params are certified SSE-optimal vs a",
        "from-scratch Nelder-Mead multistart and stl components satisfy",
        "reconstruction/strength contracts (tests/test_fit_independent.py);",
        "heterogeneity is documented R-derived-only (SURVEY 2.6.9).",
        "",
        f"**{n_ok}/{n_golden} golden checks within the reference's own tolerances.**",
        "",
        "| series | feature | ours | golden | abs diff | |",
        "|---|---|---|---|---|---|",
    ]
    for label, k, v, g, d, s in rows:
        vs = "nan" if (isinstance(v, float) and np.isnan(v)) else f"{v:.6g}"
        lines.append(f"| {label} | {k} | {vs} | {g} | {d} | {s} |")
    with open("docs/PARITY.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/PARITY.md ({n_ok}/{n_golden} golden OK)")


if __name__ == "__main__":
    main()
