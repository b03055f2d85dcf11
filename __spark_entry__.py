"""Driver contract for the spark-graft builder (PySpark target).

Backed by ``motive_rdf_spark.contract`` — every implemented operator
from SURVEY.md §2 is registered there as a (spark_query, oracle_sql)
pair; this module adapts that registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the KG triples
    view, run the vee BGP (co-located customer/supplier motif) through
    the join-expansion matcher, and aggregate support per nation."""
    from motive_rdf_spark.contract import bgp_support_by_nation

    return bgp_support_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from motive_rdf_spark.contract import registry

    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    from motive_rdf_spark.contract import registry

    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
