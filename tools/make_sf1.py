#!/usr/bin/env python
"""Derive an sf1-scale test directory from the driver's sf0.1 parquet
(r10 verdict task 1: the sf0.1→sf1 scale rehearsal of the
pair-expansion tier needs 10× data that does not exist in
/root/testdata, which is read-only).

Scaling rule: 10 key-shifted copies of every scaling table, with the
content transforms chosen so the SIMILARITY STRUCTURE scales the way a
real corpus does — a constant duplicate RATE, not a constant duplicate
set:

- ``documents``: copy 0 is verbatim; in copy c every whitespace token
  gets a ``~c`` suffix, so shingle/winnow/set-similarity structure
  WITHIN a copy is identical to the original while CROSS-copy n-gram
  overlap is ~zero.  Total near-dup pairs therefore grow 10× (linear),
  exactly what "10× more documents at the same dup rate" means.
  Replicating texts verbatim instead would give every doc 10 exact
  twins — a quadratic pair blow-up that measures the synthetic
  replication, not the operator.
- ``embeddings``: per-copy deterministic DIMENSION ROTATION (circular
  shift by ``copy·7`` positions).  A permutation is an isometry, so
  every WITHIN-copy cosine — the original neighborhood structure — is
  preserved exactly, while cross-copy cosines are shifted
  autocorrelations of near-uniform vectors (≈0 ± 1/√64), i.e. no new
  near-dup pairs.  r12 note: the first derivation used a ±0.0018
  additive jitter instead, believing small perturbation ≈ same
  density — it actually manufactured a 10-CLIQUE of near-twins
  (cos ≈ 0.999999) per source vector, the exact constant-duplicate-SET
  blow-up the documents rule above exists to avoid, and the full-suite
  sf1 slope caught it as a 34× super-linear flag on the SRP
  incremental probe (candidate pairs grew with clique², measuring the
  synthetic replication, not the operator).
- ``lineitem/orders/customer/supplier/part/events``: key columns shift
  by copy-sized strides (joins stay consistent within a copy);
  value/date distributions are untouched.
- ``region/nation``: fixed-size dimensions (TPC-H semantics) — copied
  verbatim.

Usage:  python tools/make_sf1.py [out_dir]   (default /tmp/opl_sf1)
Writes <out_dir>/*.parquet; pass it as the hi leg of the slope bench:
  SPARK_GRAFT_SLOPE_DIRS=/root/testdata/sf0.1:/tmp/opl_sf1 \\
  SPARK_GRAFT_SLOPE_IDS=q_setsim_join,... \\
  SPARK_GRAFT_SLOPE_OUT=BENCH_SLOPE_SF1.json python bench.py --slope
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
#: copies of the sf0.1 base (default 10 → "sf1").  Overridable via
#: OPL_SF1_COPIES for intermediate scales — r13 uses 3 ("sf0.3") to
#: give the three pair/wedge-expansion DuckDB oracle replays that time
#: out at sf1 a completable above-gate parity leg.
COPIES = int(os.environ.get("OPL_SF1_COPIES", "10"))

#: key strides — far above any sf0.1 key range
C = 10_000_000   # custkey / partkey / doc_id / vec_id / user_id
O = 100_000_000  # orderkey
S = 1_000_000    # suppkey
E = 100_000_000  # event_id


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opl_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS cp")
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    jobs = {
        "documents": f"""
            SELECT doc_id + cp * {C} AS doc_id,
                   CASE WHEN cp = 0 THEN text
                        ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> w || '~' || cp), ' ')
                   END AS text,
                   lang, source,
                   CAST(length(CASE WHEN cp = 0 THEN text
                        ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> w || '~' || cp), ' ')
                   END) AS BIGINT) AS n_chars
            FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN copies
        """,
        "embeddings": f"""
            SELECT vec_id + cp * {C} AS vec_id,
                   CAST(list_transform(range(1, len(embedding) + 1),
                        i -> embedding[((i - 1 + cp * 7) % len(embedding)) + 1])
                        AS FLOAT[]) AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet') CROSS JOIN copies
        """,
        "lineitem": f"""
            SELECT l_orderkey + cp * {O} AS l_orderkey,
                   l_partkey + cp * {C} AS l_partkey,
                   l_suppkey + cp * {S} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN copies
        """,
        "orders": f"""
            SELECT o_orderkey + cp * {O} AS o_orderkey,
                   o_custkey + cp * {C} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN copies
        """,
        "customer": f"""
            SELECT c_custkey + cp * {C} AS c_custkey,
                   c_name || '#' || cp AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet') CROSS JOIN copies
        """,
        "supplier": f"""
            SELECT s_suppkey + cp * {S} AS s_suppkey,
                   s_name || '#' || cp AS s_name, s_nationkey, s_acctbal
            FROM read_parquet('{SRC}/supplier.parquet') CROSS JOIN copies
        """,
        "part": f"""
            SELECT p_partkey + cp * {C} AS p_partkey,
                   p_name || '#' || cp AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM read_parquet('{SRC}/part.parquet') CROSS JOIN copies
        """,
        "events": f"""
            SELECT event_id + cp * {E} AS event_id, ts,
                   user_id + cp * {C} AS user_id,
                   event_type, value, props
            FROM read_parquet('{SRC}/events.parquet') CROSS JOIN copies
        """,
    }
    for t, q in jobs.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf1 directory ready: {out}")


if __name__ == "__main__":
    main()
