"""Per-Spark-job breakdown of one corpus entry, via the event log.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/job_profile.py <entry> [warm_reps]

Runs the entry twice (cold discarded, warm measured) in a session with
``spark.eventLog.enabled``, then parses the event log: one line per job
with wall, summed task time, shuffle read/write bytes, and the job
group/description — guide §1.5/§7: this is the "which stage is slow"
attribution the Spark UI would give, in a headless sandbox.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="evlog-")

    from stellar_etl_airflow_spark.session import get_spark

    spark = get_spark(
        "job-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
        warm_ds=True,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from stellar_etl_airflow_spark.queries import QUERIES

    spec = QUERIES[name]
    # cold rep absorbs codegen/session warmup
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    marker = time.time() * 1000
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"== {name} warm wall {wall:.2f}s  (event times below are the WARM rep)")
    spark.stop()

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    # Spark 4 writes a rolling eventlog_v2_<app> DIRECTORY of events_* files
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths += [
            os.path.join(root, f)
            for f in files
            if "appstatus" not in f and not f.endswith(".crc")
        ]
    for p in sorted(paths):
        with open(p) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": props.get("spark.job.description")
                        or props.get("callSite.short", ""),
                        "task_time": 0.0,
                        "sh_read": 0,
                        "sh_write": 0,
                        "in_bytes": 0,
                        "tasks": 0,
                    }
                    for sid in ev.get("Stage IDs", []):
                        stage_to_job[sid] = jid
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    jid = stage_to_job.get(sid)
                    if jid is None or jid not in jobs:
                        continue
                    m = ev.get("Task Metrics") or {}
                    j = jobs[jid]
                    j["task_time"] += (m.get("Executor Run Time") or 0) / 1000.0
                    j["tasks"] += 1
                    sr = m.get("Shuffle Read Metrics") or {}
                    j["sh_read"] += (sr.get("Remote Bytes Read") or 0) + (
                        sr.get("Local Bytes Read") or 0
                    )
                    sw = m.get("Shuffle Write Metrics") or {}
                    j["sh_write"] += sw.get("Shuffle Bytes Written") or 0
                    im = m.get("Input Metrics") or {}
                    j["in_bytes"] += im.get("Bytes Read") or 0

    warm = [(jid, j) for jid, j in sorted(jobs.items()) if j["start"] >= marker]
    total = 0.0
    prev_end = None
    for jid, j in warm:
        dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        prev_end = j.get("end", j["start"])
        total += dur
        print(
            f"  job {jid:3d}  {dur:6.2f}s  (+{gap:5.2f}s gap)  tasks={j['tasks']:<4d} "
            f"taskTime={j['task_time']:7.2f}s  in={j['in_bytes']/1e6:7.1f}MB "
            f"shR={j['sh_read']/1e6:6.1f}MB shW={j['sh_write']/1e6:6.1f}MB  {j['desc'][:70]}"
        )
    print(f"  == sum job walls {total:.2f}s vs entry wall {wall:.2f}s "
          f"(difference = driver-side work: manifest/footer IO, planning, collect)")
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
