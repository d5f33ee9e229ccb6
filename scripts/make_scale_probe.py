"""Synthesize a NON-GRADED sf1-equivalent probe dataset (~10x sf0.1) for
the second-decade scaling measurement (VERDICT r10 #4).

No sf1 testdata exists in the sandbox, so this replicates sf0.1 tenfold
with per-replica KEY OFFSETS so join fan-outs, group counts, and key
cardinalities scale with the data — the properties a scaling probe needs —
rather than stacking 10 identical copies onto the same keys (which would
turn every per-key operator into a 10x-hot-key stress test instead of a
bigger corpus).

SYNTHETIC-PROBE CAVEATS (documented, by design; this directory is never
oracle-graded and never replaces driver testdata):
- key-offset replication makes 10 DISJOINT subgraphs for the co-purchase
  operators (real TPC-H at 10x SF would mix parts across the whole
  domain; per-node degree is the same either way, components don't merge);
- document texts get a per-replica suffix so fingerprints/hashes vary
  across replicas while length/token statistics stay representative;
- embeddings are rotated by the replica index (norm- and
  distribution-preserving, direction-varying) so near-dup/cluster
  structure is not 10 identical copies of every vector;
- dimension tables (region, nation) are copied as-is, exactly as TPC-H
  scaling does.

Output: .scale_probe/sf1eq/*.parquet under the repo root (git-ignored).
Usage: python scripts/make_scale_probe.py [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scale_probe", "sf1eq")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({reps})) AS r")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        path = os.path.join(OUT, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{path}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)

    # key-domain sizes (offsets multiply by max+1 so replicas never collide)
    k = {}
    for t, c in (
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        k[c] = con.sql(f"SELECT max({c}) + 1 FROM {src(t)}").fetchone()[0]
    k["user_id"] = con.sql(
        f"SELECT max(user_id) + 1 FROM {src('events')}"
    ).fetchone()[0]

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    write("customer", f"""
        SELECT c_custkey + r * {k['c_custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, reps""")
    write("supplier", f"""
        SELECT s_suppkey + r * {k['s_suppkey']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {src('supplier')}, reps""")
    write("part", f"""
        SELECT p_partkey + r * {k['p_partkey']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')}, reps""")
    write("orders", f"""
        SELECT o_orderkey + r * {k['o_orderkey']} AS o_orderkey,
               o_custkey + r * {k['c_custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, reps""")
    write("lineitem", f"""
        SELECT l_orderkey + r * {k['o_orderkey']} AS l_orderkey,
               l_partkey + r * {k['p_partkey']} AS l_partkey,
               l_suppkey + r * {k['s_suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, reps""")
    write("events", f"""
        SELECT event_id + r * {k['event_id']} AS event_id,
               ts,
               user_id + r * {k['user_id']} AS user_id,
               event_type, value, props
        FROM {src('events')}, reps""")
    write("documents", f"""
        SELECT doc_id + r * {k['doc_id']} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' repl' || CAST(r AS VARCHAR) END AS text,
               lang, source,
               CASE WHEN r = 0 THEN n_chars
                    ELSE n_chars + 5 + len(CAST(r AS VARCHAR)) END AS n_chars
        FROM {src('documents')}, reps""")
    # rotation by r: emb[r+1:] || emb[:r] (1-indexed DuckDB list slices)
    write("embeddings", f"""
        SELECT vec_id + r * {k['vec_id']} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE embedding[r + 1:] || embedding[1:r] END AS embedding,
               label
        FROM {src('embeddings')}, reps""")
    print(f"probe dataset at {OUT} ({reps} replicas of sf0.1)")


if __name__ == "__main__":
    main()
