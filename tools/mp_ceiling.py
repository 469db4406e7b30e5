"""Host-ceiling baseline for the cluster2 scaling pair (4 vs 16 pinned cores).

Runs the EXACT cascade kernel (gen_doc + rollup_doc over the same deterministic
corpus) as plain pinned multiprocessing — no Spark, no JVM, no Arrow, no
scheduler. Whatever 4 -> 16-core efficiency THIS shows is the host's physical
ceiling for that shape (hypervisor steal + shared memory bandwidth); no engine
running the same kernel on the same cores can beat it. Engine-relative
efficiency for the cluster2 protocol = spark_eff / host_eff.

Method mirrors tools/run_scaling.py: interleaved (small, big) pairs, a pinned
capacity probe immediately before each arm, pairs scored quiet when both
probes are within SPARK_GRAFT_QUIET_FRAC of the session-best probe. The small
arm pins to cores 0-3 and the big arm to cores 0-15 — the identical taskset
sets run_scaling.py gives the local-cluster[2,2] / [8,2] arms.

The only difference from the Spark compute phase is the token source: workers
regenerate tokens via the Philox generator instead of scanning parquet (no
shared scan exists without Spark). Generation is pure per-doc CPU, identical
per token on both arms, so it shifts absolute tokens/sec but not the ratio.

Usage: python tools/mp_ceiling.py [n_docs] [pairs]   (accumulates into
BENCH/mp_ceiling.json and prints a summary)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUIET_FRAC = float(os.environ.get("SPARK_GRAFT_QUIET_FRAC", "0.93"))
OUT = os.environ.get(
    "SPARK_GRAFT_MP_CEILING_OUT",
    os.path.join(REPO, "BENCH", "mp_ceiling.json"))

SMALL = list(range(4))    # = taskset 0-3  (local-cluster[2,2] arm)
BIG = list(range(16))     # = taskset 0-15 (local-cluster[8,2] arm)


def _spin(core: int, dur: float, q) -> None:
    os.sched_setaffinity(0, {core})
    end = time.perf_counter() + dur
    it = 0
    x = 1.0
    while time.perf_counter() < end:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
        it += 1
    q.put(it)


def pinned_probe(cores: list[int], dur: float = 1.2) -> float:
    """Aggregate busy-loop iterations/sec across one pinned worker per core —
    host capacity delivered to EXACTLY this core set right now."""
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=_spin, args=(c, dur, q)) for c in cores]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / dur


def _worker(core: int, w: int, nworkers: int, n_docs: int, q) -> None:
    os.sched_setaffinity(0, {core})
    from tsfeatures_spark.operators.rollup import rollup_doc
    from tsfeatures_spark.sources.generator import gen_doc

    tok = 0
    for i in range(w, n_docs, nworkers):
        doc_id, tokens, src = gen_doc(42, i)
        rollup_doc(doc_id, src, tokens)
        tok += len(tokens)
    q.put(tok)


def run_arm(cores: list[int], n_docs: int) -> dict:
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    t0 = time.perf_counter()
    procs = [ctx.Process(target=_worker, args=(c, w, len(cores), n_docs, q))
             for w, c in enumerate(cores)]
    for p in procs:
        p.start()
    tokens = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    sec = time.perf_counter() - t0
    return {"sec": round(sec, 3), "tokens": tokens,
            "tps": int(tokens / sec)}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    hist: list[dict] = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
        if prior.get("n_docs") == n_docs:
            hist = prior["pairs"]
    for k in range(pairs):
        rec = {}
        for label, cores in (("small", SMALL), ("big", BIG)):
            probe = pinned_probe(cores)
            r = run_arm(cores, n_docs)
            r["probe"] = int(probe)
            r["probe_per_core"] = int(probe / len(cores))
            rec[label] = r
            print(f"[pair {k}] {label} ({len(cores)} cores): {r['sec']}s "
                  f"({r['tps']:,} tok/s, probe {probe/1e3:.0f}k, "
                  f"{r['probe_per_core']/1e3:.1f}k/core)", flush=True)
        hist.append(rec)
        with open(OUT, "w") as f:
            json.dump({"n_docs": n_docs, "pairs": hist}, f, indent=1)

    # summary over ALL accumulated pairs
    pmax_core = max(max(p["small"]["probe_per_core"], p["big"]["probe_per_core"])
                    for p in hist)
    quiet = [p for p in hist
             if min(p["small"]["probe_per_core"], p["big"]["probe_per_core"])
             >= QUIET_FRAC * pmax_core]
    t_small = min(p["small"]["sec"] for p in hist)
    t_big = min(p["big"]["sec"] for p in hist)
    eff_minwall = t_small / (4 * t_big)
    out = {"n_pairs": len(hist), "eff_minwall": round(eff_minwall, 3),
           "small_best_sec": t_small, "big_best_sec": t_big,
           "quiet_pairs": len(quiet)}
    if quiet:
        eq = max(p["small"]["sec"] / (4 * p["big"]["sec"]) for p in quiet)
        out["eff_best_quiet"] = round(eq, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
