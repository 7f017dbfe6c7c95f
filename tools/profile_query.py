"""Per-job profile of one or more suite queries via the Spark event log.

Usage: python tools/profile_query.py QUERY [QUERY ...]

Runs each query once warm (untimed) and once timed with the noop sink,
with the event log enabled, then prints per-job wall clock, stage task
counts, shuffle bytes and task-time totals — the breakdown the Spark UI
would show, but scriptable.  Guide §1: decide whether time goes to
scheduling, shuffle, or compute before touching the code.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def parse_event_log(log_dir: str) -> list[dict]:
    """Return [{job_id, t0, t1, desc, stages:{id: info}}] from the one
    application log under ``log_dir``."""
    apps = []
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            if not f.startswith(".") and "appstatus" not in f:
                apps.append(os.path.join(root, f))
    events = []
    for app in apps:
        with open(app) as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except ValueError:
                    pass
    jobs: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = {}
    stage_names: dict[int, str] = {}
    for ev in events:
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "job_id": jid,
                "t0": ev["Submission Time"],
                "t1": None,
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif kind == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stage_names[sid] = si.get("Stage Name", "")
            stage_metrics.setdefault(sid, {
                "tasks": si.get("Number of Tasks", 0),
                "task_time_ms": 0, "sh_read": 0, "sh_write": 0,
                "input": 0, "t0": si.get("Submission Time"),
                "t1": si.get("Completion Time"),
            })
        elif kind == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            sm = stage_metrics.setdefault(sid, {
                "tasks": 0, "task_time_ms": 0, "sh_read": 0,
                "sh_write": 0, "input": 0, "t0": None, "t1": None})
            sm["task_time_ms"] += m.get("Executor Run Time", 0)
            sm["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0) + \
                (m.get("Shuffle Read Metrics") or {}).get(
                "Local Bytes Read", 0)
            sm["sh_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0)
            sm["input"] += (m.get("Input Metrics") or {}).get(
                "Bytes Read", 0)
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        j["stage_info"] = {
            sid: {**stage_metrics.get(sid, {}),
                  "name": stage_names.get(sid, "?")}
            for sid in j["stages"]}
        out.append(j)
    return out


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from kiji_mapreduce_spark.session import make_session
    from kiji_mapreduce_spark import suite

    log_dir = tempfile.mkdtemp(prefix="spark-evlog-")
    spark = make_session(
        app_name="kiji-mr-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        })
    sc = spark.sparkContext
    all_queries = {**suite.QUERIES,
                   **{f"staged_{n}": f for n, f in suite.STAGED.items()}}
    marks: list[tuple[str, float, float]] = []
    for name in names:
        fn = all_queries[name]
        # warm (JIT/codegen) run, untimed
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        sc.setJobDescription(f"TIMED:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t1 = time.time()
        sc.setJobDescription(None)
        marks.append((name, t0 * 1000, t1 * 1000))
        print(f"== {name}: {t1 - t0:.3f}s warm wall clock")
    spark.stop()

    jobs = parse_event_log(log_dir)
    for name, m0, m1 in marks:
        print(f"\n==== {name} ({(m1 - m0) / 1000:.3f}s) ====")
        sel = [j for j in jobs
               if j["t0"] is not None and m0 - 500 <= j["t0"]
               and (j["t1"] or j["t0"]) <= m1 + 500
               and j["desc"].startswith("TIMED:")]
        prev_end = None
        for j in sel:
            dur = ((j["t1"] or j["t0"]) - j["t0"]) / 1000
            gap = "" if prev_end is None else \
                f" (+{(j['t0'] - prev_end) / 1000:.3f}s gap)"
            prev_end = j["t1"] or j["t0"]
            print(f"  job {j['job_id']}: {dur:.3f}s{gap}")
            for sid, s in sorted(j["stage_info"].items()):
                if not s.get("tasks") and not s.get("task_time_ms"):
                    continue
                print(f"    stage {sid}: {s.get('tasks', 0)} tasks, "
                      f"task-time {s.get('task_time_ms', 0) / 1000:.2f}s, "
                      f"input {s.get('input', 0) / 1e6:.1f}MB, "
                      f"shR {s.get('sh_read', 0) / 1e6:.1f}MB, "
                      f"shW {s.get('sh_write', 0) / 1e6:.1f}MB  "
                      f"| {s.get('name', '?')[:60]}")
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
