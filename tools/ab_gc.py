"""Interleaved A/B of JVM GC / memory configs for the rollup hot stage.

Motivated by event-log profiling (tools/profile_rollup.py): the cascade
stage spends ~24% of executor run time in G1 GC pauses at local[8]/48g
heap. Each arm is a fresh pinned bench.py rollup-only run; arms are
interleaved so host steal noise hits all of them equally.

Usage: python tools/ab_gc.py [n_docs] [rounds] [cpus]
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
    ("g1-default", {}),
    ("parallelgc", {"SPARK_GRAFT_DRIVER_JAVA_OPTS": "-XX:+UseParallelGC"}),
    ("g1-region32m", {"SPARK_GRAFT_DRIVER_JAVA_OPTS": "-XX:G1HeapRegionSize=32m"}),
    ("parallelgc-8g", {"SPARK_GRAFT_DRIVER_JAVA_OPTS": "-XX:+UseParallelGC",
                       "SPARK_DRIVER_MEM": "8g"}),
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
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    for r in range(rounds):
        for label, extra in ARMS:
            probe = capacity_probe(8)
            res = run_once(cpus, n_docs, extra)
            print(f"round {r} {label:14s} wall {res['sec']:8.3f}s "
                  f"tps {res['tokens_per_sec']:>10,} probe {probe/1e3:.0f}k",
                  flush=True)


if __name__ == "__main__":
    main()
