"""Column profiling: per-column statistics (count / nulls / distinct /
min / max / mean / exact median) for a set of numeric columns, in ONE
aggregation pass.

The obvious formulation — melt the table to (column, value) rows and
groupBy(column) — shuffles the entire table once per profile run. This
implementation instead computes every statistic as an expression of a
single global ``agg`` (partial-aggregatable, so executors combine
map-side and the driver sees one row), then unpivots the 1-row result
with ``stack``: the only data movement is the final single-row
combine. ``count(DISTINCT ...)`` over several columns expands the
aggregate buffer (Spark's Expand), still map-side combinable.

Exact median uses ``percentile`` (Spark's exact linear-interpolation
percentile, same rule DuckDB's ``quantile_cont`` applies), not
``approx_percentile`` — the contract needs value-identical oracles.
At 100 TB, swap in ``approx_percentile`` and drop the distinct counts
to keep the buffer O(1); the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """DataFrame[column, n, n_null, n_distinct, min, max, mean, p50]
    — one row per profiled column, stats rounded to 4dp."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nnull"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndist"),
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__mean"),
            F.round(F.expr(f"percentile({c}, 0.5)"), 4).alias(f"{c}__p50"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nnull, {c}__ndist, {c}__min, {c}__max, {c}__mean, {c}__p50"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n, n_null, n_distinct, min, max, mean, p50)"
    )


def column_profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle: same stats per column, UNION ALL over columns."""
    parts = [
        f"""SELECT '{c}' AS "column",
       COUNT({c}) AS n,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(CAST(MIN({c}) AS DOUBLE), 4) AS "min",
       ROUND(CAST(MAX({c}) AS DOUBLE), 4) AS "max",
       ROUND(AVG({c}), 4) AS mean,
       ROUND(quantile_cont({c}, 0.5), 4) AS p50
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)
