"""Measure each arm shape's near-empty-job CPU floor (round 5).

The work-conservation section of BENCH/BASELINE.md compares total
process-tree CPU seconds between the N and 4N arms. A wide arm pays a
fixed per-JVM cost (startup, JIT warmup, GC threads) that scales with
executor COUNT, not with data — on a real cluster it is paid once per
executor lifetime and amortizes to nothing over 100 TB, so the marginal
per-token work ratio is the figure that predicts scaling. This tool runs
the identical harness leg (bench.py, SPARK_GRAFT_ROLLUP_ONLY) at 200 docs
(compute <0.2 s) once per distinct arm shape and records the tree CPU:
everything above ~0 compute is the floor.

Writes BENCH/cpu_floor.json {"n_docs": 200, "arms": {label: {cpu_s, sec}}}.
Run under tools/devrun.sh so the capture loop yields the cores.

Usage: python tools/cpu_floor.py [n_docs=200]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import PROTOCOLS, REPO, run_once  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seen: dict[str, dict] = {}
    for proto in PROTOCOLS:
        for label, cpus, master in PROTOCOLS[proto]["arms"]:
            if label in seen:
                continue
            r = run_once(cpus, n_docs, "none", master)
            seen[label] = {"cpu_s": r.get("cpu_s"), "sec": r["sec"],
                           "tokens": r["tokens"]}
            print(f"{label}: wall {r['sec']}s, tree CPU {r.get('cpu_s')}s",
                  flush=True)
    out = os.path.join(REPO, "BENCH", "cpu_floor.json")
    with open(out, "w") as f:
        json.dump({"n_docs": n_docs, "arms": seen}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
