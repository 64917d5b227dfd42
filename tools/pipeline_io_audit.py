"""I/O audit for the write-carrying pipelines (VERDICT r12 #6, guide §6):
run pipeline_arrival_to_dim / pipeline_incremental_load once, then walk
the lifecycle scratch root BEFORE interpreter exit and report, per layer,
the file count and size histogram — the question is whether any layer
fans out into tiny files from over-partitioned writes.

Usage: python tools/pipeline_io_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from kafka_etl_automation_spark.session import get_spark

    spark = get_spark("pipeline_io_audit")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    walls = {}
    for name in ("pipeline_arrival_to_dim", "pipeline_incremental_load"):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[name] = round(time.time() - t0, 3)

    from kafka_etl_automation_spark.plans import lifecycle

    root = lifecycle._TMP_ROOT
    report: dict[str, dict] = {}
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        layer = "/".join(rel.split(os.sep)[:2])  # <pipeline-tag>/<layer>
        for f in files:
            if f.startswith((".", "_")) and not f.startswith("part-"):
                continue
            p = os.path.join(dirpath, f)
            sz = os.path.getsize(p)
            r = report.setdefault(
                layer, {"n_files": 0, "bytes": 0, "n_data_files": 0}
            )
            r["n_files"] += 1
            r["bytes"] += sz
            if f.startswith("part-") and not f.endswith(".crc"):
                r["n_data_files"] += 1
    print(json.dumps({"walls": walls, "layers": report}, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
