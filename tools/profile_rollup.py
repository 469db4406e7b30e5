"""Decompose the rollup wall clock at one parallelism level from the Spark
event log: stage wall vs sum(task run time)/cores (perfect-balance ideal),
straggler tail (max task), JVM GC time, (de)serialization, scheduler delay.

Used to attribute the N->4N efficiency gap: if sum(task)/cores ~= wall the
arm is balance-clean and the gap is per-core throughput (shared DRAM/JVM —
the term a real 4N-executor cluster scales out); if wall >> sum/cores the
tail or scheduling is the problem and the job itself needs fixing.

Usage: taskset -c 0-7 python tools/profile_rollup.py [cpus] [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)

    from pyspark.sql import functions as F

    from tsfeatures_spark.operators.rollup import rollup_tiers
    from tsfeatures_spark.session import get_spark

    # Profile the SHIPPED session config (get_spark defaults: ParallelGC,
    # 8g heap, 512-row Arrow batches) with event logging layered on via the
    # standard extra-conf knob, so re-runs validate the current setup.
    # SPARK_GRAFT_LEGACY_PROFILE=1 reproduces the round-2 pathology config
    # (G1 default, 48g heap, 1024-row batches) that motivated the GC fix.
    ev_conf = (f"spark.eventLog.enabled=true;spark.eventLog.dir={evdir};"
               "spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false")
    if os.environ.get("SPARK_GRAFT_LEGACY_PROFILE"):
        ev_conf += (";spark.sql.execution.arrow.maxRecordsPerBatch=1024;"
                    "spark.driver.memory=48g;spark.driver.extraJavaOptions=")
    prior = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = (prior + ";" if prior else "") + ev_conf
    spark = get_spark("profile-rollup", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # local-cluster executors run separate JVMs whose Python workers don't
    # inherit this process's sys.path — ship the package zip
    import __spark_entry__ as entrymod
    entrymod._ensure_pkg_on_executors(spark)

    import bench

    tok_path = os.path.join(REPO, ".data", f"tokens_bench_{n_docs}")
    bench.ensure_token_table(spark, tok_path)
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(tok_path) for fn in fns if fn.endswith(".parquet")
    )
    split = max(total_bytes // (cpus * 16), 1 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 18))
    toks = spark.read.parquet(tok_path)
    toks.select(F.sum(F.size("tokens"))).collect()
    rollup_tiers(toks.limit(cpus * 2).repartition(cpus)).count()

    t0 = time.time()
    rollup_tiers(toks).count()
    wall = time.time() - t0
    spark.stop()

    # parse the event log (single app dir or file under evdir)
    tasks = []
    stages = {}
    for root, _, files in os.walk(evdir):
        for fn in files:
            if fn.startswith("."):
                continue
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    e = ev.get("Event")
                    if e == "SparkListenerTaskEnd":
                        m = ev.get("Task Metrics") or {}
                        ti = ev.get("Task Info") or {}
                        tasks.append({
                            "stage": ev.get("Stage ID"),
                            "run_ms": m.get("Executor Run Time", 0),
                            "gc_ms": m.get("JVM GC Time", 0),
                            "deser_ms": m.get("Executor Deserialize Time", 0),
                            "ser_ms": m.get("Result Serialization Time", 0),
                            "launch": ti.get("Launch Time", 0),
                            "finish": ti.get("Finish Time", 0),
                        })
                    elif e == "SparkListenerStageCompleted":
                        si = ev.get("Stage Info") or {}
                        stages[si.get("Stage ID")] = {
                            "name": (si.get("Stage Name") or "")[:60],
                            "n_tasks": si.get("Number of Tasks"),
                            "submit": si.get("Submission Time"),
                            "complete": si.get("Completion Time"),
                        }
    shutil.rmtree(evdir, ignore_errors=True)

    # report per stage, largest first
    by_stage: dict[int, list[dict]] = {}
    for t in tasks:
        by_stage.setdefault(t["stage"], []).append(t)
    rows = []
    for sid, ts in by_stage.items():
        s = stages.get(sid, {})
        stage_wall = ((s.get("complete") or 0) - (s.get("submit") or 0)) / 1e3
        run_sum = sum(t["run_ms"] for t in ts) / 1e3
        rows.append({
            "stage": sid,
            "name": s.get("name", "?"),
            "tasks": len(ts),
            "stage_wall_s": round(stage_wall, 2),
            "task_sum_s": round(run_sum, 2),
            "ideal_s": round(run_sum / cpus, 2),
            "balance": round(run_sum / cpus / stage_wall, 3) if stage_wall else None,
            "max_task_s": round(max(t["run_ms"] for t in ts) / 1e3, 2),
            "gc_s": round(sum(t["gc_ms"] for t in ts) / 1e3, 2),
            "deser_s": round(sum(t["deser_ms"] for t in ts) / 1e3, 2),
        })
    rows.sort(key=lambda r: -r["task_sum_s"])
    print(json.dumps({"cpus": cpus, "n_docs": n_docs, "wall_s": round(wall, 2),
                      "stages": rows[:6]}, indent=1))


if __name__ == "__main__":
    main()
