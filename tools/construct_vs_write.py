"""Split each query's wall into CONSTRUCTION (eager driver-side jobs run
while building the DataFrame: cache counts, audit collects, localCheckpoint
loops) vs the final noop WRITE (the actual query plan), plus job counts
from the statusTracker. No event log — nothing to perturb the timing.

Usage: python tools/construct_vs_write.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]) and os.sep in args[0]:
        sf_dir = args.pop(0)

    from kafka_etl_automation_spark.session import get_spark

    spark = get_spark("construct_vs_write")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    qs["a1_minmax_nvl"](spark, sf_dir).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    st = spark.sparkContext.statusTracker()
    report = {}
    for name in args:
        fn = qs[name]
        for run in range(2):
            j0 = max(st.getJobIdsForGroup() or [0])
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            j1 = max(st.getJobIdsForGroup() or [0])
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = max(st.getJobIdsForGroup() or [0])
            spark.catalog.clearCache()
            report[f"{name}#{run}"] = {
                "construct_sec": round(t1 - t0, 3),
                "write_sec": round(t2 - t1, 3),
                "construct_jobs": j1 - j0,
                "write_jobs": j2 - j1,
            }
            print(f"# {name}#{run}: {report[f'{name}#{run}']}", file=sys.stderr)
    print(json.dumps(report, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
