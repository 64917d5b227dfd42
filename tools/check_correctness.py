"""Local differential checker mimicking the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at a given SF and compares with
the DuckDB oracle: row count, column names, and an order-insensitive value
hash (columns sorted by name, rows sorted by stringified tuple). Strict
string equality on cell values — stricter than any plausible driver hash,
so passing here is a good predictor of passing the driver gate.

Usage: python tools/check_correctness.py [--partitions N] [sf_dir] [name ...]

--partitions N sizes spark.sql.shuffle.partitions (default 32, the driver
gate's value). Because every oracle hash is partition-count-independent, a
green full sweep at a second value (e.g. 7) proves the whole board
partition-invariant: spark@N == oracle == spark@32 — the float-summation /
LISTAGG-ordering failure class cannot hide (VERDICT r04 #3).
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def dtype_sig(df: pd.DataFrame) -> list[str]:
    """Canonical per-column type signature, tz-aware.

    Integer/float widths are collapsed (the value hash already pins values)
    but datetime kind, unit and TIMEZONE are kept verbatim: the driver's
    schema gate distinguishes naive TIMESTAMP from TIMESTAMPTZ
    (ext_sessionize, VERDICT r02 #1/#3), so this checker must too.
    """
    sig = []
    for c in sorted(df.columns):
        dt = df[c].dtype
        kind = getattr(dt, "kind", None)
        if kind in ("i", "u"):
            sig.append(f"{c}:int")
        elif kind == "f":
            sig.append(f"{c}:float")
        elif kind == "b":
            sig.append(f"{c}:bool")
        elif kind == "M":  # datetime64 — keep tz (None for naive) explicit
            tz = getattr(dt, "tz", None)
            sig.append(f"{c}:datetime[tz={tz}]")
        else:
            sig.append(f"{c}:{dt}")
    return sig


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """Order-insensitive value hash: per-cell canonical strings, rows
    joined with '|', sorted, sha256. Vectorized column-wise (the original
    itertuples formulation cost ~320s on a 30M-row frame at the 300x
    octave — the checker, not the engines, dominated); cell semantics are
    unchanged and only need to be IDENTICAL for both engines within one
    run, since the hash is always computed fresh on both sides:
    - NULL/NaT/NaN -> '<NULL>'
    - float64 -> shortest round-trip repr (numpy str == Python repr)
    - datetime64 -> '%Y-%m-%d %H:%M:%S.%f'
    - everything else -> str(v)
    """
    import numpy as np

    cols = sorted(df.columns)
    parts = []
    for c in cols:
        s = df[c]
        kind = getattr(s.dtype, "kind", None)
        if kind == "M":
            out = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif kind == "f":
            out = s.astype(str)  # numpy shortest repr == Python repr
        elif kind == "O":
            # str() elementwise, preserving the old per-cell behavior for
            # Decimals/arrays/strings; floats hiding in object columns
            # keep repr semantics via str() identically
            out = s.map(lambda v: "<NULL>" if v is None else str(v))
        else:
            out = s.astype(str)
        mask = s.isna()
        if getattr(mask, "any", lambda: False)():
            out = out.where(~mask, "<NULL>")
        parts.append(out.to_numpy(dtype=object))
    if parts:
        joined = pd.Series(parts[0], dtype=object)
        for p in parts[1:]:
            # Series.str.cat, NOT np.char.add: the latter materializes
            # fixed-width unicode arrays (rows x max-width bytes — ruinous
            # when a text column rides along)
            joined = joined.str.cat(pd.Series(p, dtype=object), sep="|")
        rows = joined.sort_values(kind="stable").to_numpy()
    else:
        rows = np.array([""] * len(df), dtype=object)
    hasher = hashlib.sha256()
    step = 1_000_000
    for i in range(0, len(rows), step):
        block = "\n".join(rows[i : i + step].tolist())
        if i:
            block = "\n" + block
        hasher.update(block.encode())
    h = hasher.hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    argv = list(sys.argv[1:])
    partitions = "32"
    if "--partitions" in argv:
        i = argv.index("--partitions")
        partitions = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    # Deliberately a VANILLA session (not get_spark): the driver gate builds
    # its own SparkSession, so queries must be correct without any factory
    # confs — round 1 failed exactly this way (VERDICT.md item 1).
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", partitions)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures, errors, no_oracle = [], [], []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        # one erroring query must REPORT, not kill the sweep — the r03
        # ext_sessionize break went unnoticed because an earlier error
        # aborted the whole run (VERDICT r03 #3)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            errors.append(name)
            msg = str(exc).splitlines()[0][:200]
            print(f"  {name:28s} ERROR {msg} [{time.time()-t0:.1f}s]")
            try:  # a dead session makes clearCache itself raise; the
                spark.catalog.clearCache()  # sweep must still continue
            except Exception:
                pass
            continue
        spark.catalog.clearCache()  # LSH ops persist() multi-branch frames
        if name not in oracles:
            no_oracle.append(name)
            print(f"  {name:28s} rows={len(sdf):>7} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        ddf = con.execute(oracles[name]).df()
        sn, sc, sh = canon(sdf)
        dn, dc, dh = canon(ddf)
        st, dt_ = dtype_sig(sdf), dtype_sig(ddf)
        ok = (sn, sc, sh, st) == (dn, dc, dh, dt_)
        status = "OK " if ok else "FAIL"
        print(f"  {name:28s} {status} rows={sn}/{dn} hash={sh}/{dh} "
              f"[{time.time()-t0:.1f}s]")
        if not ok:
            failures.append(name)
            if sc != dc:
                print(f"    cols spark={sc}\n    cols duck ={dc}")
            elif st != dt_:
                bad = [(a, b) for a, b in zip(st, dt_) if a != b]
                print(f"    dtype mismatch: {bad}")
            elif sn == dn:
                m = sdf[sorted(sdf.columns)].copy()
                d = ddf[sorted(ddf.columns)].copy()
                print(f"    dtypes spark={list(m.dtypes)}\n    dtypes duck ={list(d.dtypes)}")
                print("    spark head:", m.head(3).to_dict("records"))
                print("    duck  head:", d.head(3).to_dict("records"))
    print(f"\n{n_run - len(failures) - len(errors) - len(no_oracle)} ok, "
          f"{len(failures)} failed, {len(errors)} errored, "
          f"{len(no_oracle)} rows-only "
          f"[shuffle.partitions={partitions}]")
    if failures:
        print("FAILED:", failures)
    if errors:
        print("ERRORED:", errors)
    return 1 if failures or errors else 0


if __name__ == "__main__":
    sys.exit(main())
