"""Continuous host-ceiling sampler for the cluster2 pair shape.

tools/mp_ceiling.py showed the hypervisor delivers LESS per-core capacity to
a 16-core pinned set than to a 4-core pinned set in the same minutes (the
"wide-set tax") — the same physics that caps 8->32 at ~2.75x aggregate. The
scaling-efficiency ceiling for ANY engine running 4 vs 16 pinned cores at an
instant is therefore R = percore(cores 0-15) / percore(cores 0-3), not 1.0.

This sampler measures R every cycle (two 1.2 s pinned busy-loop probes, back
to back) and appends JSON lines to BENCH/probe_samples.jsonl so the round
report can cite the QUIET-WINDOW distribution of R: engine-relative
efficiency = measured Spark efficiency / R(quiet). It skips cycles while a
scaling trial or a heavy dev command is running (both would corrupt the
sample AND steal cores from the workload being measured).

Usage: python tools/probe_sampler.py [max_hours] [sleep_sec]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mp_ceiling import BIG, SMALL, pinned_probe  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "probe_samples.jsonl")
TRIAL_FLAG = "/tmp/graft_trial_running"
DEV_FLAG = "/tmp/graft_dev_busy"


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    sleep_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    deadline = time.time() + max_hours * 3600
    while time.time() < deadline:
        if os.path.exists(TRIAL_FLAG) or os.path.exists(DEV_FLAG):
            time.sleep(30)
            continue
        small = pinned_probe(SMALL)
        big = pinned_probe(BIG)
        rec = {
            "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "small_percore": int(small / len(SMALL)),
            "big_percore": int(big / len(BIG)),
            "ratio": round((big / len(BIG)) / (small / len(SMALL)), 4),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        time.sleep(sleep_sec)


if __name__ == "__main__":
    main()
