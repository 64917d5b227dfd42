"""Calibrated cross-round bench comparison (VERDICT r11 #4).

r12 is the first round with ``calib_sec`` (the host-calibration constant
bench.py measures from a fixed, data-free hash aggregation) present in
BOTH rounds' artifacts, so per-query movement can finally be read with
host drift divided out:

    ratio = (wall_new / calib_new) / (wall_old / calib_old)

A calibrated ratio ~1.0 means the query costs the same number of
"host units" as last round regardless of how fast this week's machine
happens to be; only ratios past the flag threshold (default 1.2x) need a
story. This replaces the r10/r11 protocol of re-running the previous
round's code on the current host to separate drift from regression.

Usage: python tools/calibrated_compare.py OLD.json NEW.json [--flag 1.2]
Prints one markdown table row per query plus a trailing JSON summary.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = list(sys.argv[1:])
    flag = 1.2
    if "--flag" in args:
        i = args.index("--flag")
        flag = float(args[i + 1])
        del args[i : i + 2]
    if len(args) != 2:
        print(__doc__)
        return 2
    # Driver-written BENCH_rNN.json artifacts wrap the bench line in a
    # {"n", "rc", ..., "parsed": {...}} envelope; locally-saved ones are
    # the bench line itself. Accept both.
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    # `or old` (ADVICE r12): a failed driver bench carries "parsed": null —
    # fall back to the envelope so it hits the calib_sec-missing message
    # below instead of an AttributeError here.
    old = old.get("parsed") or old
    new = new.get("parsed") or new
    c_old, c_new = old.get("calib_sec"), new.get("calib_sec")
    if not c_old or not c_new:
        print(
            f"calib_sec missing (old={c_old}, new={c_new}) — calibrated "
            "comparison needs it on both sides",
            file=sys.stderr,
        )
        return 1
    host = c_new / c_old
    qo, qn = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(qo) & set(qn)):
        r = (qn[name] / c_new) / (qo[name] / c_old)
        rows.append((name, qo[name], qn[name], round(r, 3)))
    rows.sort(key=lambda t: -t[3])
    flagged = [r for r in rows if r[3] > flag]
    print(f"| query | old s | new s | calibrated ratio |")
    print(f"|---|---|---|---|")
    for name, o, n, r in rows:
        mark = " **FLAG**" if r > flag else ""
        print(f"| {name} | {o} | {n} | {r}{mark} |")
    print(
        json.dumps(
            {
                "calib_old": c_old,
                "calib_new": c_new,
                "host_ratio": round(host, 3),
                "total_old": old.get("value"),
                "total_new": new.get("value"),
                "total_calibrated_ratio": round(
                    (new.get("value", 0) / c_new) / (old.get("value", 1) / c_old),
                    3,
                ),
                "flag_threshold": flag,
                "flagged": [r[0] for r in flagged],
                "only_old": sorted(set(qo) - set(qn)),
                "only_new": sorted(set(qn) - set(qo)),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
