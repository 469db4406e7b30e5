"""Quick interleaved A/B of scaling-arm configurations (local[N] vs
local-cluster[W,C,M]) for protocol exploration. One line per run:
config, wall sec, tokens/sec, capacity probe.

Usage: python tools/ab_master.py [n_docs] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import capacity_probe  # noqa: E402

ARMS = [
    # (label, cpus_pinned, extra_env)
    ("local[2]", 2, {}),
    ("local[8]", 8, {}),
    ("lc[1,2]", 2, {"SPARK_GRAFT_MASTER": "local-cluster[1,2,5120]"}),
    ("lc[4,2]", 8, {"SPARK_GRAFT_MASTER": "local-cluster[4,2,5120]"}),
]


def run_once(cpus: int, n_docs: int, extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_DOCS": str(n_docs),
        "SPARK_GRAFT_ROLLUP_ONLY": "1",
        "SPARK_GRAFT_TRIALS": "1",
        "SPARK_GRAFT_SINK": "none",
    })
    env.update(extra_env)
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    if out.returncode != 0 or not out.stdout.strip():
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py failed (rc={out.returncode}); stderr above")
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["rollup"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    for r in range(rounds):
        for label, cpus, extra in ARMS:
            probe = capacity_probe(8)
            res = run_once(cpus, n_docs, extra)
            print(f"round {r} {label:10s} wall {res['sec']:8.3f}s "
                  f"tps {res['tokens_per_sec']:>10,} probe {probe/1e3:.0f}k",
                  flush=True)


if __name__ == "__main__":
    main()
