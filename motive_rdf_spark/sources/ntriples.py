"""N-Triples source: gzip-transparent line reader + dictionary encode.

The reference loads RDF graphs by two-pass dictionary encoding
(KGraph.loadHDT, KGraph.java:1197-1317; the dogfood dataset ships as
``.nt.gz``, parsed line-wise by its own oracle script
src/test/resources/python/test_rdflib.py:13-19). Spark equivalent:
``spark.read.text`` (gz is transparent), native ``regexp_extract`` for
the three terms — no Python in the parse path — then two dictionary
joins (pipeline/encode.py) replacing strings with dense long ids.

Term grammar (the subset the dogfood file uses, which is all the
reference handles): subject = IRI | blank node; predicate = IRI;
object = IRI | blank node | literal (with optional @lang / ^^type).
Literals are nodes like any other, as in the reference.

Id-assignment rule: lexicographic dense ids (encode.dense_ids) rather
than the reference's first-seen order — a consistent bijection, which
is all P/R comparison needs (SURVEY.md §7.3); constants in queries are
resolved by IRI through the dictionary, never by raw id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from motive_rdf_spark.pipeline.encode import dense_ids

# subject/predicate: non-space token; object: everything up to the
# final ' .' terminator (literals may contain spaces)
_LINE_RX = r"^\s*(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(.*?)\s*\.\s*$"


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples file (optionally .gz) into string terms:
    DataFrame[subj, pred, obj]. Malformed/comment lines are dropped."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _LINE_RX, 1).alias("subj"),
        F.regexp_extract("value", _LINE_RX, 2).alias("pred"),
        F.regexp_extract("value", _LINE_RX, 3).alias("obj"),
    )
    return parsed.filter((F.col("subj") != "") & (F.col("pred") != "") & (F.col("obj") != ""))


def encode_graph(
    nt: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """String triples -> (triples[s,p,o] long, node_dict, pred_dict).

    Nodes (subjects ∪ objects) and predicates get disjoint dense id
    spaces starting at 0, like the reference's two dictionaries."""
    node_dict = dense_ids(
        nt.select(F.col("subj").alias("term")).unionAll(nt.select(F.col("obj").alias("term"))),
        "term",
    )
    pred_dict = dense_ids(nt.select(F.col("pred").alias("term")), "term")
    enc = (
        nt.join(node_dict.select(F.col("term").alias("subj"), F.col("id").alias("s")), "subj")
        .join(F.broadcast(pred_dict.select(F.col("term").alias("pred"), F.col("id").alias("p"))), "pred")
        .join(node_dict.select(F.col("term").alias("obj"), F.col("id").alias("o")), "obj")
        .select("s", "p", "o")
    )
    return enc, node_dict, pred_dict


def term_id(dictionary: DataFrame, term: str) -> int:
    """Resolve one term to its id (for grounding query constants)."""
    rows = dictionary.filter(F.col("term") == term).collect()
    if not rows:
        raise KeyError(term)
    return int(rows[0]["id"])


def write_ntriples(
    triples: DataFrame,
    path: str,
    node_dict: DataFrame | None = None,
    pred_dict: DataFrame | None = None,
    compression: str | None = None,
) -> None:
    """N-Triples sink — the interchange path out of the engine: a
    constructed/materialized graph round-trips through any RDF tool
    (and back through :func:`read_ntriples`; equality pinned by test).

    Pass string triples (columns subj/pred/obj, terms serialized as
    parsed — IRIs keep their ``<>``, literals their quotes/tags), or
    encoded long triples (columns s/p/o) together with both
    dictionaries to decode first. The write is a distributed text
    write (one shard per partition, gz-compressible via
    ``compression="gzip"``) — never a driver-side collect."""
    if {"subj", "pred", "obj"}.issubset(triples.columns):
        strs = triples
    else:
        if node_dict is None or pred_dict is None:
            raise ValueError("encoded triples need node_dict and pred_dict")
        from motive_rdf_spark.pipeline.encode import decode_triples

        strs = decode_triples(triples.select("s", "p", "o"), node_dict, pred_dict)
    lines = strs.select(
        F.concat_ws(" ", F.col("subj"), F.col("pred"), F.col("obj"), F.lit(".")).alias(
            "value"
        )
    )
    w = lines.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)
