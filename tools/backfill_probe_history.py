"""One-off (round 5): seed BENCH/probe_history.jsonl from the probe values
already printed in BENCH/quiet_capture.log, so era-relative quiet scoring
(run_scaling._era_pmax) has a dense contemporaneous ceiling for the pairs
captured TODAY before history logging existed. Entries are tagged
'backfill'; values are the log's printed precision (0.1k), which only
shifts an era ceiling by <=0.2% — pairs themselves carry exact probes.

Usage: python tools/backfill_probe_history.py YYYY-MM-DD
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import PROBE_HISTORY, PROTOCOLS, REPO  # noqa: E402

CORES = {p: PROTOCOLS[p]["arms"][1][1] for p in PROTOCOLS}
LINE = re.compile(r"^\[(\d\d:\d\d:\d\d)\].*?(\w+)/(?:none|parquet)"
                  r".*?probe (\d+(?:\.\d+)?)k")


def main() -> None:
    day = sys.argv[1]
    base = time.mktime(time.strptime(day, "%Y-%m-%d"))
    out = []
    with open(os.path.join(REPO, "BENCH", "quiet_capture.log")) as f:
        for line in f:
            m = LINE.search(line)
            if not m:
                continue
            hms, proto, val = m.groups()
            if proto not in CORES:
                continue
            h, mi, se = (int(x) for x in hms.split(":"))
            out.append({"t": base + h * 3600 + mi * 60 + se,
                        "cores": CORES[proto],
                        "probe": float(val) * 1000.0, "tag": "backfill"})
    existing = set()
    if os.path.exists(PROBE_HISTORY):
        with open(PROBE_HISTORY) as f:
            existing = {l.strip() for l in f if l.strip()}
    added = 0
    with open(PROBE_HISTORY, "a") as f:
        for rec in out:
            s = json.dumps(rec)
            if s not in existing:
                f.write(s + "\n")
                added += 1
    print(f"backfilled {added} probe records from quiet_capture.log")


if __name__ == "__main__":
    main()
