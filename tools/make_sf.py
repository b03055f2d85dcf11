"""Deterministic 10x scale-up of the driver's sf0.1 testdata -> a
synthetic sf1.0 dataset for the superlinearity check (one bench point
at 10x rows; VERDICT r2 item 9).

Replication scheme: replica i in [0, K) shifts every entity key by a
per-table offset chosen so the shifted key spaces (a) never collide
across replicas and (b) stay inside the disjoint node-id ranges
`kg_tpch.triples_view` assigns (custkey+1e6 < 2e6, suppkey+2e6 < 3e6,
partkey+3e6 < 1e7, orderkey+1e7). `region`/`nation` stay fixed — TPC-H
dims don't scale, which preserves the real skew profile (10x more
customers per nation, the exact regime where the vee query's output
grows quadratically *by design*). Document text and embeddings get a
replica tag so replicas are near- but not exact duplicates (keeps the
dedup operators' workload honest). Everything is a pure function of
the source rows + replica index — no RNG, fully reproducible.

Usage: python tools/make_sf.py [--src /root/testdata/sf0.1]
                               [--out /tmp/spark_graft_sf1.0] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# key offsets per replica step; see module doc for the range proof
OFF = {
    "custkey": 50_000,
    "suppkey": 50_000,
    "partkey": 50_000,
    "orderkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def table_sql(table: str, k: int) -> str | None:
    """Replicated SELECT for one table (None = copy unchanged)."""
    r = f"(SELECT UNNEST(range({k})) AS i) reps"
    if table in ("region", "nation"):
        return None
    if table == "customer":
        return f"""SELECT c_custkey + i*{OFF['custkey']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment FROM t CROSS JOIN {r}"""
    if table == "supplier":
        return f"""SELECT s_suppkey + i*{OFF['suppkey']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal FROM t CROSS JOIN {r}"""
    if table == "part":
        return f"""SELECT p_partkey + i*{OFF['partkey']} AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice FROM t CROSS JOIN {r}"""
    if table == "orders":
        return f"""SELECT o_orderkey + i*{OFF['orderkey']} AS o_orderkey,
                   o_custkey + i*{OFF['custkey']} AS o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority FROM t CROSS JOIN {r}"""
    if table == "lineitem":
        return f"""SELECT l_orderkey + i*{OFF['orderkey']} AS l_orderkey,
                   l_partkey + i*{OFF['partkey']} AS l_partkey,
                   l_suppkey + i*{OFF['suppkey']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate FROM t CROSS JOIN {r}"""
    if table == "events":
        return f"""SELECT event_id + i*{OFF['event_id']} AS event_id, ts,
                   user_id + i*{OFF['user_id']} AS user_id, event_type,
                   value, props FROM t CROSS JOIN {r}"""
    if table == "documents":
        # replica tag makes copies near- (not exact-) duplicates
        return f"""SELECT doc_id + i*{OFF['doc_id']} AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text,
                   lang, source,
                   CASE WHEN i = 0 THEN n_chars ELSE n_chars + 2 + length(CAST(i AS VARCHAR)) END AS n_chars
                   FROM t CROSS JOIN {r}"""
    if table == "embeddings":
        # perturb one coordinate by a tiny replica-dependent epsilon:
        # near-identical (ANN recall stays meaningful), never bit-equal
        return f"""SELECT vec_id + i*{OFF['vec_id']} AS vec_id,
                   list_transform(embedding, (x, j) ->
                     CASE WHEN j = 1 THEN CAST(x + i * 1e-4 AS FLOAT) ELSE x END) AS embedding,
                   label FROM t CROSS JOIN {r}"""
    raise ValueError(table)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1.0")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        con.sql(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{args.src}/{t}.parquet')")
        sql = table_sql(t, args.k)
        body = sql if sql is not None else "SELECT * FROM t"
        con.sql(f"COPY ({body}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
