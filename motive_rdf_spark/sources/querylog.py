"""SPARQL query-log scan: extract BGP bodies from a (gzipped) query
log — the reference's ``exec/Queries.java:39-97`` (regex-extract the
``WHERE {...}`` body of URL-encoded log lines).

Native Spark path: ``spark.read.text`` (gz transparent) →
``url_decode`` → ``regexp_extract`` — no Python. The reference
experiment only *prints* the extracted BGPs (SURVEY.md §7.4), so the
operator surface here is the extraction itself plus a triple-pattern
splitter usable as matcher input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_WHERE_RX = r"(?i)WHERE\s*\{([^}]*)\}"


def read_query_log(spark: SparkSession, path: str) -> DataFrame:
    """Log lines -> DataFrame[query] (url-decoded raw queries that
    contain a WHERE body)."""
    lines = spark.read.text(path)
    decoded = lines.select(F.url_decode(F.col("value")).alias("query"))
    return decoded.filter(F.col("query").rlike(_WHERE_RX))


def extract_bgps(queries: DataFrame, query_col: str = "query") -> DataFrame:
    """DataFrame[query] -> DataFrame[bgp string, n_triple_patterns].

    The BGP body is the first WHERE{...} group; triple patterns are the
    '.'-separated clauses (the reference's splitting, Queries.java:71-84).
    """
    body = F.regexp_extract(F.col(query_col), _WHERE_RX, 1)
    # split only on dots with surrounding whitespace — a bare '.' also
    # appears inside IRIs (http://ex.org/...), which must not split
    clauses = F.filter(
        F.transform(F.split(body, r"\s+\.\s+"), lambda c: F.trim(c)),
        lambda c: F.length(c) > 0,
    )
    return queries.select(
        F.trim(body).alias("bgp"),
        F.size(clauses).cast("long").alias("n_triple_patterns"),
    ).filter(F.length("bgp") > 0)


def synthesize_query_log(
    spark: SparkSession, rows: int, seed: int = 42, hash_fn: str = "xx"
) -> DataFrame:
    """Deterministic fake query log (url-encoded SPARQL-ish lines) for
    tests/benchmarks — no external data. ``hash_fn="md5"`` makes the
    pattern-count distribution reconstructible by the DuckDB oracle
    (data/generators.seeded_hash)."""
    from motive_rdf_spark.data.generators import seeded_hash

    k = F.col("id").cast("string")
    npat = (
        F.pmod(seeded_hash(hash_fn, F.col("id"), F.lit(seed)), F.lit(3)) + 1
    ).cast("int")
    # patterns like "?s <p0> ?o . ?o <p1> ?x"
    body = F.concat_ws(
        " . ",
        F.transform(
            F.sequence(F.lit(1), npat),
            lambda i: F.concat(F.lit("?s"), k, F.lit(" <http://ex.org/p"), i.cast("string"), F.lit("> ?o"), i.cast("string")),
        ),
    )
    raw = F.concat(F.lit("SELECT * WHERE {"), body, F.lit("}"))
    return spark.range(rows).select(F.url_encode(raw).alias("value"))
