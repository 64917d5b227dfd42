"""Scale ladder for the deployable documents-linear dedup/decontam shape
(VERDICT r05 #4): times ext_dedup_canonical_lsh (collapse -> banded LSH ->
connected components -> keep-list) and ext_decontamination_lsh across the
inflated octaves, min-of-two per point, and prints one JSON line per
(query, octave) plus a trailing summary. Run EXCLUSIVELY (no concurrent
local[32] JVM) — walls feed BENCH_SCALE.md.

Usage: python tools/dedup_ladder.py DIR [DIR...] [--queries a,b] [--runs 2]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    argv = sys.argv[1:]
    runs = 2
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    qnames = ["ext_dedup_canonical_lsh", "ext_decontamination_lsh"]
    if "--queries" in argv:
        i = argv.index("--queries")
        qnames = argv[i + 1].split(",")
        del argv[i : i + 2]
    dirs = argv or ["/tmp/sf3.0", "/tmp/sf10.0", "/tmp/sf30.0"]

    import __spark_entry__ as entry_mod
    from kafka_etl_automation_spark.session import get_spark

    spark = get_spark("dedup-ladder")
    qs = entry_mod.queries()
    out = []
    for sf_dir in dirs:
        for name in qnames:
            walls, rows = [], None
            for _ in range(runs):
                t0 = time.time()
                rows = qs[name](spark, sf_dir).count()
                walls.append(round(time.time() - t0, 1))
                spark.catalog.clearCache()
            rec = {
                "query": name,
                "sf_dir": sf_dir,
                "rows": rows,
                "wall_sec": min(walls),
                "runs": walls,
            }
            print(json.dumps(rec), flush=True)
            out.append(rec)
    print(json.dumps({"ladder": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
