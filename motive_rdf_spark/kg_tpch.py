"""Knowledge-graph view over the driver's TPC-H-ish testdata tables.

Maps the relational star schema to a (s, p, o) triples table with
disjoint integer id ranges per entity type — the same trick the
reference's dictionary encoding plays (dense int ids per IRI,
KGraph.java:1222-1317), except here the "IRIs" are typed keys.

The exact same construction exists as an ANSI-SQL CTE (``TRIPLES_CTE``)
so every BGP/degree query has a DuckDB oracle.

Id ranges (disjoint at any tested SF):
  nation     n_nationkey                 [0, 1e3)
  region     1_000 + r_regionkey         [1e3, 1e6)
  customer   1_000_000 + c_custkey       [1e6, 2e6)
  supplier   2_000_000 + s_suppkey       [2e6, 3e6)
  part       3_000_000 + p_partkey       [3e6, 1e7)
  orders     10_000_000 + o_orderkey     [1e7, …)

Predicates:
  0 in_nation   (customer→nation, supplier→nation)
  1 placed      (customer→order)
  2 contains    (order→part)      [from lineitem]
  3 supplied_by (part→supplier)   [from lineitem; deduped]
  4 in_region   (nation→region)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

P_IN_NATION, P_PLACED, P_CONTAINS, P_SUPPLIED_BY, P_IN_REGION = 0, 1, 2, 3, 4

OFF_REGION = 1_000
OFF_CUSTOMER = 1_000_000
OFF_SUPPLIER = 2_000_000
OFF_PART = 3_000_000
OFF_ORDER = 10_000_000


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    names = "region nation customer supplier part orders lineitem events documents embeddings".split()
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def triples_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KG as a deduped (s,p,o) DataFrame — Spark construction."""
    t = load_tables(spark, sf_dir)

    def tri(df: DataFrame, s, p: int, o) -> DataFrame:
        return df.select(
            s.cast("long").alias("s"),
            F.lit(p).cast("long").alias("p"),
            o.cast("long").alias("o"),
        )

    parts = [
        tri(t["customer"], F.col("c_custkey") + OFF_CUSTOMER, P_IN_NATION, F.col("c_nationkey")),
        tri(t["supplier"], F.col("s_suppkey") + OFF_SUPPLIER, P_IN_NATION, F.col("s_nationkey")),
        tri(t["orders"], F.col("o_custkey") + OFF_CUSTOMER, P_PLACED, F.col("o_orderkey") + OFF_ORDER),
        tri(t["lineitem"], F.col("l_orderkey") + OFF_ORDER, P_CONTAINS, F.col("l_partkey") + OFF_PART),
        tri(t["lineitem"], F.col("l_partkey") + OFF_PART, P_SUPPLIED_BY, F.col("l_suppkey") + OFF_SUPPLIER),
        tri(t["nation"], F.col("n_nationkey"), P_IN_REGION, F.col("n_regionkey") + OFF_REGION),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionAll(q)
    return out.dropDuplicates()


# graph-load is once-per-dataset in a real deployment; repeated contract/
# bench queries reuse the prepared (deduped + triple-id'd) cached graph.
# Keyed by applicationId, not id(spark): a stopped session's id() can be
# reused by a new SparkSession, which would hand back a DataFrame bound
# to a dead context (ADVICE r1).
_PREPARED: dict[tuple[str, str], DataFrame] = {}


def prepared_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KG with the matcher's triple-id column, deduped once and
    cached per (application, dataset) — the Spark analog of KGraph's
    load-once in-memory graph (KGraph.java:126-145)."""
    from motive_rdf_spark.operators.bgp import prepare_triples

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    if key not in _PREPARED:
        # drop entries from other (stopped) applications so persisted
        # DataFrames from dead contexts are not kept alive
        for stale in [k for k in _PREPARED if k[0] != app_id]:
            del _PREPARED[stale]
        _PREPARED[key] = prepare_triples(triples_view(spark, sf_dir)).persist()
    return _PREPARED[key]


_STORES: dict[tuple[str, str], object] = {}


def prepared_store(spark: SparkSession, sf_dir: str):
    """GraphStore over the prepared KG: s-/o-partitioned cached copies
    (the in-memory analog of bucketed graph tables) so matcher
    expansion joins skip the graph-side exchange when joins don't
    broadcast — see operators.bgp.GraphStore."""
    from motive_rdf_spark.operators.bgp import GraphStore

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    if key not in _STORES:
        for stale in [k for k in _STORES if k[0] != app_id]:
            del _STORES[stale]
        _STORES[key] = GraphStore(prepared_triples(spark, sf_dir))
    return _STORES[key]


# Matching DuckDB CTE — byte-equivalent semantics to triples_view().
TRIPLES_CTE = """
WITH triples AS (
  SELECT DISTINCT s, p, o FROM (
    SELECT CAST(c_custkey + 1000000 AS BIGINT) AS s, CAST(0 AS BIGINT) AS p, CAST(c_nationkey AS BIGINT) AS o FROM customer
    UNION ALL
    SELECT CAST(s_suppkey + 2000000 AS BIGINT), CAST(0 AS BIGINT), CAST(s_nationkey AS BIGINT) FROM supplier
    UNION ALL
    SELECT CAST(o_custkey + 1000000 AS BIGINT), CAST(1 AS BIGINT), CAST(o_orderkey + 10000000 AS BIGINT) FROM orders
    UNION ALL
    SELECT CAST(l_orderkey + 10000000 AS BIGINT), CAST(2 AS BIGINT), CAST(l_partkey + 3000000 AS BIGINT) FROM lineitem
    UNION ALL
    SELECT CAST(l_partkey + 3000000 AS BIGINT), CAST(3 AS BIGINT), CAST(l_suppkey + 2000000 AS BIGINT) FROM lineitem
    UNION ALL
    SELECT CAST(n_nationkey AS BIGINT), CAST(4 AS BIGINT), CAST(n_regionkey + 1000 AS BIGINT) FROM nation
  )
)
"""
