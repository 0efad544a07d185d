"""Stage-level decomposition of one steady-state invocation per query via
the Spark event log: like job_profile.py, but prints the top stages by
summed task time (executor work) and by stage wall, with the stage name
(callsite) — so the expensive operator inside a multi-job entry is
identifiable.

Usage: python scripts/stage_profile.py [--sf=...] [--top=20] name1 ...
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
    top = 20
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--top="):
            top = int(a.split("=", 1)[1])
        else:
            names.append(a)

    evdir = tempfile.mkdtemp(prefix="dcs-evlog-")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("stage-profile")
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
                    events.append(json.loads(line))
                except ValueError:
                    continue

    # stage-id -> summed task time (ms), from TaskEnd events
    stage_task: dict[int, float] = {}
    stage_tasks_n: dict[int, int] = {}
    for ev in events:
        if ev.get("Event") == "SparkListenerTaskEnd":
            ti = ev.get("Task Info", {})
            sid = ev.get("Stage ID")
            if ti and sid is not None:
                stage_task[sid] = stage_task.get(sid, 0.0) + (
                    ti["Finish Time"] - ti["Launch Time"]
                )
                stage_tasks_n[sid] = stage_tasks_n.get(sid, 0) + 1

    for name, t0, t1 in marks:
        rows = []
        for ev in events:
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            if sub is None or not (t0 <= sub <= t1):
                continue
            sid = si["Stage ID"]
            rows.append(
                {
                    "sid": sid,
                    "name": si.get("Stage Name", "")[:90],
                    "ntask": stage_tasks_n.get(sid, 0),
                    "task_s": round(stage_task.get(sid, 0.0) / 1000.0, 2),
                    "wall_s": round(
                        (si.get("Completion Time", sub) - sub) / 1000.0, 3
                    ),
                }
            )
        rows.sort(key=lambda r: -r["task_s"])
        print(f"== {name}: {len(rows)} stages ==", file=sys.stderr)
        for r in rows[:top]:
            print(
                f"  task_s={r['task_s']:<8} wall={r['wall_s']:<7} "
                f"n={r['ntask']:<4} sid={r['sid']:<5} {r['name']}",
                file=sys.stderr,
            )
        print(
            json.dumps({"name": name, "stages": rows[:top]}), flush=True
        )


if __name__ == "__main__":
    main()
