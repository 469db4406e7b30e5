"""One-off (round 5): stamp 't' onto today's already-recorded pairs by
matching their leg wall-times against BENCH/quiet_capture.log lines, so
era-relative quiet scoring covers the pairs captured before run_pair
started timestamping. A pair is stamped only when exactly one log line
matches its (proto, mode, big-leg sec) — ambiguous matches are skipped.

Usage: python tools/backfill_pair_timestamps.py YYYY-MM-DD
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import PROTOCOLS, REPO  # noqa: E402

LEG = re.compile(r"^\[(\d\d:\d\d:\d\d)\]\s+(\w+)/(none|parquet)\s+\S+:\s+"
                 r"([\d.]+)s \(")


def main() -> None:
    day = sys.argv[1]
    base = time.mktime(time.strptime(day, "%Y-%m-%d"))
    seen: dict = {}
    with open(os.path.join(REPO, "BENCH", "quiet_capture.log")) as f:
        for line in f:
            m = LEG.search(line)
            if not m:
                continue
            hms, proto, mode, sec = m.groups()
            h, mi, se = (int(x) for x in hms.split(":"))
            key = (proto, mode, float(sec))
            seen.setdefault(key, []).append(base + h * 3600 + mi * 60 + se)
    for proto in PROTOCOLS:
        path = os.path.join(REPO, "BENCH", PROTOCOLS[proto]["file"])
        if not os.path.exists(path):
            continue
        with open(path) as f:
            d = json.load(f)
        stamped = 0
        for mode, pairs in d["results"].items():
            for p in pairs:
                if "t" in p or "small" not in p:
                    continue
                hits = seen.get((proto, mode, float(p["big"]["sec"])), [])
                if len(hits) == 1:
                    p["t"] = hits[0]
                    stamped += 1
        if stamped:
            with open(path, "w") as f:
                json.dump(d, f, indent=1)
        print(f"{proto}: stamped {stamped} pairs")


if __name__ == "__main__":
    main()
