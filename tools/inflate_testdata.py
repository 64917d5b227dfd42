"""Build an inflated copy of a testdata SF dir for scale-proofing.

Union-multiplies every table by ``--mult`` (default 30) with perturbed
keys so the result behaves like a genuinely bigger dataset, not M
re-reads of the same rows (VERDICT r04 #1):

- fact/dim keys shift by ``k * (max_key + 1)`` per copy k, and FOREIGN
  keys shift in lockstep (copy k of orders references copy k of
  customer), so join selectivity and per-key fan-out match the base SF;
- ``events`` keeps user_id UNCHANGED and shifts ts by k * (span + 1 day):
  the same users stay active over an M-times-longer period, so per-user
  state (sessions, HWM windows, rolling frames) grows M-times — skewed
  users stay skewed, which is what makes the skew caps and salting
  actually trigger at the inflated SF;
- ``documents`` rewrites ' the ' -> ' the{k} ' per copy: shingles
  containing the most frequent token all change, so most copies are
  genuinely distinct documents, while docs without ' the ' stay exact
  duplicates — a realistic crawl-like mix of fresh text and dup groups
  (dedup paths see real work, not a single giant dup cluster);
- ``embeddings`` adds k*3e-4 to every component (distinct vectors with
  perturbed neighborhoods); region/nation copy as-is (dims are fixed).

DuckDB does the multiply (one COPY per table, threads=16); output
layout matches /root/testdata/sf*/ so SPARK_GRAFT_SF_DIR can point at
it directly.

Usage: python tools/inflate_testdata.py OUT_DIR [--mult M] [--src DIR]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"


def _stride(con: duckdb.DuckDBPyConnection, path: str, col: str) -> int:
    return con.execute(f"SELECT MAX({col}) + 1 FROM '{path}'").fetchone()[0]


def main() -> int:
    args = list(sys.argv[1:])
    if not args:
        print(__doc__)
        return 2
    out = args.pop(0)
    mult = 30
    src = SRC_DEFAULT
    tables = None
    while args:
        a = args.pop(0)
        if a == "--mult":
            mult = int(args.pop(0))
        elif a == "--src":
            src = args.pop(0)
        elif a == "--tables":
            # inflate only these tables (comma-separated) — e.g. a
            # documents-only 900x octave for the dedup/decontamination
            # ladder without paying for 1.6B lineitem rows; symlink the
            # remaining tables from another inflated dir if a query needs
            # them (the ladder queries load only documents)
            tables = args.pop(0).split(",")
        else:
            raise SystemExit(f"unknown arg {a}")

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    p = {t: f"{src}/{t}.parquet" for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    )}
    C = _stride(con, p["customer"], "c_custkey")
    S = _stride(con, p["supplier"], "s_suppkey")
    P = _stride(con, p["part"], "p_partkey")
    O = _stride(con, p["orders"], "o_orderkey")
    E = _stride(con, p["events"], "event_id")
    D = _stride(con, p["documents"], "doc_id")
    V = _stride(con, p["embeddings"], "vec_id")
    span_days = con.execute(
        f"SELECT CAST(ceil(date_diff('day', MIN(ts), MAX(ts))) AS BIGINT) + 1 "
        f"FROM '{p['events']}'"
    ).fetchone()[0]

    sql = {
        "region": f"SELECT * FROM '{p['region']}'",
        "nation": f"SELECT * FROM '{p['nation']}'",
        "customer": f"""
            SELECT c_custkey + k * {C} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{p['customer']}', range({mult}) r(k)""",
        "supplier": f"""
            SELECT s_suppkey + k * {S} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM '{p['supplier']}', range({mult}) r(k)""",
        "part": f"""
            SELECT p_partkey + k * {P} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM '{p['part']}', range({mult}) r(k)""",
        "orders": f"""
            SELECT o_orderkey + k * {O} AS o_orderkey,
                   o_custkey + k * {C} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{p['orders']}', range({mult}) r(k)""",
        "lineitem": f"""
            SELECT l_orderkey + k * {O} AS l_orderkey,
                   l_partkey + k * {P} AS l_partkey,
                   l_suppkey + k * {S} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{p['lineitem']}', range({mult}) r(k)""",
        "events": f"""
            SELECT event_id + k * {E} AS event_id,
                   ts + to_days(CAST(k * {span_days} AS INT)) AS ts,
                   user_id, event_type, value, props
            FROM '{p['events']}', range({mult}) r(k)""",
        "documents": f"""
            SELECT doc_id + k * {D} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE replace(text, ' the ', ' the' || k || ' ')
                   END AS text,
                   lang, source,
                   CAST(length(CASE WHEN k = 0 THEN text
                        ELSE replace(text, ' the ', ' the' || k || ' ')
                   END) AS BIGINT) AS n_chars
            FROM '{p['documents']}', range({mult}) r(k)""",
        "embeddings": f"""
            SELECT vec_id + k * {V} AS vec_id,
                   CASE WHEN k = 0 THEN embedding
                        ELSE CAST(list_transform(embedding,
                                  x -> x + k * 0.0003) AS FLOAT[])
                   END AS embedding,
                   label
            FROM '{p['embeddings']}', range({mult}) r(k)""",
    }
    for name, q in sql.items():
        if tables is not None and name not in tables:
            continue
        t0 = time.time()
        dest = os.path.join(out, f"{name}.parquet")
        con.execute(f"COPY ({q}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dest}'").fetchone()[0]
        mb = os.path.getsize(dest) / 1e6
        print(f"  {name:12s} {n:>10,} rows {mb:8.1f} MB [{time.time()-t0:.1f}s]")
    print(f"inflated x{mult} copy of {src} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
