"""Per-query job/stage attribution (guide §1: measure first).

Runs the named bench queries one at a time with the Spark event log
enabled, then parses the log to report, per query:

  - n_jobs: driver-side actions the query construction + noop write ran
    (eager cache counts, audit collects, localCheckpoints, the write);
  - n_stages: completed stages across those jobs;
  - wall: end-to-end seconds (construction + write, same as bench.py);
  - task_sec: summed executor task time (the "real work");
  - sched_sec = wall - max-stage-parallel estimate is NOT attempted;
    instead per-job walls expose which action dominates.

Usage: python tools/job_audit.py [sf_dir] query [query ...]
Writes a JSON report to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]) and os.sep in args[0]:
        sf_dir = args.pop(0)
    if not args:
        print("usage: job_audit.py [sf_dir] query [query ...]", file=sys.stderr)
        return 2

    log_dir = tempfile.mkdtemp(prefix="job_audit_evlog_")
    from kafka_etl_automation_spark.session import get_spark

    spark = get_spark(
        "job_audit",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # plain single-file JSON so the parser below needs no codec
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Warm-up: same protocol as bench.py so the first query doesn't pay
    # session/codegen/Arrow-worker startup.
    qs["a1_minmax_nvl"](spark, sf_dir).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    walls: dict[str, list[float]] = {}
    for name in args:
        fn = qs[name]
        for run in range(2):
            spark.sparkContext.setJobGroup(f"{name}#{run}", name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.setdefault(f"{name}#{run}", []).append(time.time() - t0)
            spark.catalog.clearCache()
            spark.sparkContext.setJobGroup(None, None)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Parse the event log: group jobs by spark.jobGroup.id property.
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(log_dir) if p.startswith(app_id)]
        path = os.path.join(log_dir, cands[0])
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    with open(path) as fh:
        for line in fh:
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
                jobs[jid] = {
                    "group": grp,
                    "t0": ev["Submission Time"],
                    "stages": ev.get("Stage IDs", []),
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "n_tasks": si.get("Number of Tasks", 0),
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                }

    report: dict[str, dict] = {}
    for jid, j in sorted(jobs.items()):
        grp = j["group"]
        if not grp or "#" not in grp:
            continue
        r = report.setdefault(
            grp,
            {"n_jobs": 0, "n_stages": 0, "n_tasks": 0, "job_walls_ms": []},
        )
        r["n_jobs"] += 1
        wall = j.get("t1", j["t0"]) - j["t0"]
        r["job_walls_ms"].append(wall)
        for sid in j["stages"]:
            if sid in stages:
                r["n_stages"] += 1
                r["n_tasks"] += stages[sid]["n_tasks"]
    for grp, r in report.items():
        r["wall_sec"] = round(sum(walls.get(grp, [0])), 3)
        r["jobs_total_ms"] = sum(r["job_walls_ms"])
        r["job_walls_ms"] = sorted(r["job_walls_ms"], reverse=True)[:12]
    print(json.dumps(report, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
