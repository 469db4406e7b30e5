"""Probe-gated DRIVER-PROTOCOL bench capture (round-4 checklist item 2).

The driver's per-round bench (`python bench.py`, defaults: local[32]
unpinned, 15k docs, parquet sink, best-of-5 rollup + best-of-3 queries)
is the number recorded in BENCH_r{N}.json. On this steal-noisy shared
host a bench launched into a noise wave reads 2-3x capability (the
round-4 "polluted preview": rollup 16.7 s best because it overlapped a
correctness job). This tool inverts the scheduling exactly like
tools/quiet_capture.py: poll the pinned capacity probe cheaply, and fire
ONE full driver bench only inside a quiet window, then exit.

Quiet bar: the 16-core probe against the session pmax accumulated in
BENCH/scaling_trials_cluster2.json (the probe measures the HOST, so the
scaling session's pmax is the right ceiling regardless of which job we
gate). Coordination: holds /tmp/graft_dev_busy while running (pauses the
capture loop) and waits for any in-flight trial pair to finish first.

Usage: python tools/quiet_driver_bench.py [max_hours] [quiet_frac]
Writes BENCH/driver_bench_quiet.json {probe_before, probe_after, bench}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import REPO, capacity_probe  # noqa: E402

TRIAL_FLAG = "/tmp/graft_trial_running"
DEV_FLAG = "/tmp/graft_dev_busy"
PROBE_CORES = 16
SLEEP_SEC = 70


def _log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _pmax() -> float:
    path = os.path.join(REPO, "BENCH", "scaling_trials_cluster2.json")
    try:
        with open(path) as f:
            return float(json.load(f)["pmax"])
    except Exception:
        return 0.0


def run_bench() -> dict:
    env = dict(os.environ)
    # the dev flag is held by THIS process: the child bench must not wait
    # on it (bench.py round-5 foreign-flag wait)
    env["SPARK_GRAFT_DEV_PARENT"] = "1"
    # driver defaults: CPUS=32, 15000 docs, parquet sink, full query set
    for k in ("SPARK_GRAFT_CPUS", "SPARK_GRAFT_BENCH_DOCS",
              "SPARK_GRAFT_ROLLUP_ONLY", "SPARK_GRAFT_SINK",
              "SPARK_GRAFT_MASTER", "SPARK_GRAFT_TRIALS"):
        env.pop(k, None)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0 or not out.stdout.strip():
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py failed rc={out.returncode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    quiet_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.90
    deadline = time.time() + max_hours * 3600
    _log(f"quiet driver-bench: budget {max_hours}h, bar {quiet_frac}*pmax")
    while time.time() < deadline:
        if os.path.exists(TRIAL_FLAG) or os.path.exists(DEV_FLAG):
            _log("trial/dev in flight; waiting")
            time.sleep(SLEEP_SEC)
            continue
        pmax = _pmax()
        probe = capacity_probe(PROBE_CORES)
        if pmax <= 0 or probe < quiet_frac * pmax:
            _log(f"probe {probe / 1e3:.1f}k < {quiet_frac * pmax / 1e3:.1f}k")
            time.sleep(SLEEP_SEC)
            continue
        _log(f"QUIET window (probe {probe / 1e3:.1f}k) — firing driver bench")
        open(DEV_FLAG, "w").close()
        try:
            # re-check: a capture-loop pair may have started during the probe
            if os.path.exists(TRIAL_FLAG):
                _log("trial started during probe; backing off")
                continue
            bench = run_bench()
            probe_after = capacity_probe(PROBE_CORES)
        finally:
            try:
                os.remove(DEV_FLAG)
            except OSError:
                pass
        rec = {"probe_before": probe, "probe_after": probe_after,
               "pmax": pmax, "quiet_frac": quiet_frac, "bench": bench}
        with open(os.path.join(REPO, "BENCH", "driver_bench_quiet.json"), "w") as f:
            json.dump(rec, f, indent=1)
        _log(f"done: rollup {bench['rollup']['sec']}s "
             f"({bench['rollup']['tokens_per_sec']:,} tok/s), "
             f"feats {bench['queries'].get('feats_default_set')}s, "
             f"probe after {probe_after / 1e3:.1f}k")
        return
    _log("budget exhausted without a quiet window")


if __name__ == "__main__":
    main()
