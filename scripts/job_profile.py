"""Job-level decomposition of one steady-state invocation per query via
the Spark event log: run warmup fn()+collect(), mark a timestamp, run a
fresh fn()+collect(), then parse the event log for jobs submitted in the
window and report

  n_jobs    — jobs submitted by the steady-state invocation,
  n_stages  — completed stages,
  n_tasks   — completed tasks,
  job_wall  — sum of per-job wall times (covers in-job driver work too),
  task_sum  — sum of task durations (executor work),
  wall      — end-to-end seconds,
  gap       — wall - job_wall = driver time OUTSIDE any job
              (analysis, AQE planning between stages ends up inside jobs;
              codegen + Python build time lands here).

Usage: python scripts/job_profile.py [--sf=...] name1 name2 ...
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)

    evdir = tempfile.mkdtemp(prefix="dcs-evlog-")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("job-profile")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    qs = e.queries()
    marks = []
    for name in names:
        qs[name](spark, sf_dir).collect()  # warmup
        t0 = time.time() * 1000
        qs[name](spark, sf_dir).collect()
        t1 = time.time() * 1000
        marks.append((name, t0, t1))
    spark.stop()
    time.sleep(1.0)

    logs = []
    for p in glob.glob(os.path.join(evdir, "*")):
        logs.extend(glob.glob(os.path.join(p, "*")) if os.path.isdir(p) else [p])
    logs = [p for p in logs if os.path.isfile(p) and "appstatus" not in p]
    events = []
    for lf in logs:
        with open(lf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                events.append(ev)

    for name, t0, t1 in marks:
        jobs = {}
        stages = {}
        tasks = []
        for ev in events:
            k = ev.get("Event")
            if k == "SparkListenerJobStart" and t0 <= ev["Submission Time"] <= t1:
                jobs[ev["Job ID"]] = [ev["Submission Time"], None]
            elif k == "SparkListenerJobEnd" and ev.get("Job ID") in jobs:
                jobs[ev["Job ID"]][1] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                if sub is not None and t0 <= sub <= t1:
                    stages[(si["Stage ID"], si["Stage Attempt ID"])] = si
            elif k == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                if ti and t0 <= ti.get("Launch Time", 0) <= t1:
                    tasks.append(ti["Finish Time"] - ti["Launch Time"])
        job_wall = sum((b - a) for a, b in jobs.values() if b) / 1000.0
        task_sum = sum(tasks) / 1000.0
        wall = (t1 - t0) / 1000.0
        print(
            json.dumps(
                {
                    "name": name,
                    "n_jobs": len(jobs),
                    "n_stages": len(stages),
                    "n_tasks": len(tasks),
                    "job_wall": round(job_wall, 3),
                    "task_sum": round(task_sum, 3),
                    "wall": round(wall, 3),
                    "gap": round(wall - job_wall, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
