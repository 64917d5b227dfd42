"""Aggregate spill evidence from a Spark event log (VERDICT r05 #5).

Pair with the checker's CHECK_EVENTLOG/CHECK_DRIVER_MEM/CHECK_CPUS env
overrides: run the sweep in a deliberately small session, then point this
at the event-log dir to see which stages spilled and how much — proving
the plans degrade to disk spill (and stay green) instead of OOMing when
partitions exceed executor memory.

Usage: python tools/spill_report.py EVENTLOG_DIR
Prints per-stage spill lines (only stages that spilled) and a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _iter_lines(d: str):
    """Yield event-log lines from both layouts: flat single-file logs and
    Spark's rolling dirs (eventlog_v2_*/events_*.zstd, decompressed via
    the zstd CLI so no python-zstandard dependency)."""
    import subprocess

    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.startswith(".") or f.startswith("appstatus"):
                continue
            path = os.path.join(root, f)
            if f.endswith(".zstd"):
                # Fail loudly when a log file cannot be decoded — a missing
                # zstd binary or a corrupt file would otherwise silently
                # yield zero events and under-report spills as "none"
                # (ADVICE r07).
                try:
                    out = subprocess.run(
                        ["zstd", "-dc", path], capture_output=True, text=True
                    )
                except FileNotFoundError:
                    raise SystemExit(
                        "zstd CLI not found: cannot decode rolling event "
                        f"log {path} — install zstd or use a flat log layout"
                    )
                if out.returncode != 0:
                    raise SystemExit(
                        f"zstd failed decoding {path} (rc={out.returncode}): "
                        f"{out.stderr.strip()[:200]}"
                    )
                yield from out.stdout.splitlines()
            else:
                with open(path, errors="ignore") as fh:
                    yield from fh


def main() -> int:
    d = sys.argv[1]
    stage_spill = defaultdict(lambda: [0, 0, 0])  # mem, disk, tasks
    stage_name = {}
    total_tasks = 0
    for line in _iter_lines(d):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stage_name[si["Stage ID"]] = si.get("Stage Name", "")
        elif e == "SparkListenerTaskEnd":
            total_tasks += 1
            m = ev.get("Task Metrics") or {}
            mem = m.get("Memory Bytes Spilled", 0)
            dsk = m.get("Disk Bytes Spilled", 0)
            if mem or dsk:
                s = stage_spill[ev["Stage ID"]]
                s[0] += mem
                s[1] += dsk
                s[2] += 1
    total_mem = sum(v[0] for v in stage_spill.values())
    total_disk = sum(v[1] for v in stage_spill.values())
    for sid in sorted(stage_spill):
        mem, dsk, n = stage_spill[sid]
        print(
            f"  stage {sid:5d}  mem_spill={mem/1e6:10.1f}MB "
            f"disk_spill={dsk/1e6:8.1f}MB tasks={n:4d}  "
            f"{stage_name.get(sid, '')[:70]}"
        )
    print(
        json.dumps(
            {
                "stages_spilled": len(stage_spill),
                "tasks_total": total_tasks,
                "mem_spill_gb": round(total_mem / 1e9, 2),
                "disk_spill_gb": round(total_disk / 1e9, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
