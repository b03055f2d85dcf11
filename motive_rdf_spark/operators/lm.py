"""Corpus-trained n-gram language-model scoring and boilerplate
detection — the CCNet/Gopher-style quality signals a training-data
pipeline runs between dedup and sampling. Everything is expressed as
explode + partial-aggregatable groupBy + key-partitioned equi-joins so
the identical computation has an exact ANSI-SQL oracle (DuckDB) and no
Python runs per row.

Scale design (100 TB corpus):

- "Training" the LM is one explode + two-level groupBy per n-gram
  order. Both aggregations are partial-aggregatable (map-side combine
  collapses each task's token multiset before the shuffle); the shuffle
  key cardinality is the *vocabulary*, not the corpus.
- Scoring is an inverted-index-shaped join: exploded doc bigrams
  against the count tables, hash-partitioned on the n-gram key. Hot
  n-grams skew only the probe side — the build side has exactly one
  row per n-gram — and AQE's skew-join splits oversized probe
  partitions. Nothing is collected to the driver: the smoothing
  vocabulary size joins in as a broadcast 1-row aggregate.
- ``boilerplate_fraction``'s frequent-shingle table is the high-DF
  *head* of the shingle distribution — small by construction (it is
  the set of shingles shared by ≥ min_df documents), so Spark's AQE
  typically broadcasts it; the pre-join per-doc distinct keeps the
  probe side at one row per (doc, distinct shingle), same shape as
  dedup.ngram_jaccard_pairs' inverted index.

Reference parity note: the reference engine has no LM scorer — these
are the beyond-reference training-data operators the graft adds
(SURVEY §2 'training-data pipeline' extension), built on the same
tokenizer contract as contract.top_token_fraction (single-space split)
so oracles stay portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from motive_rdf_spark.operators.dedup import word_ngrams


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Every bigram *instance* per document (not distinct — the LM
    needs multiplicities): DataFrame[id_col, bg]. The token array is
    materialized as a column first (the lambda-CSE pitfall: expressions
    inside higher-order-function lambdas are not common-subexpression
    eliminated, so an inline split would re-tokenize per position)."""
    toks = docs.select(F.col(id_col), F.split(text_col, " ", -1).alias("__t"))
    n = F.size("__t")
    big = F.zip_with(
        F.slice("__t", F.lit(1), n - 1),
        F.slice("__t", F.lit(2), n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return toks.select(F.col(id_col), F.explode(big).alias("bg"))


def bigram_lm_scores(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Perplexity-proxy quality score from a bigram LM trained on the
    corpus itself (the CCNet recipe, with the corpus standing in for
    the clean LM corpus): per document, the mean negative log2
    probability of its bigrams under add-alpha smoothing,

        bits(d) = avg over bigrams (w1 w2) of
                  -log2( (c(w1 w2) + a) / (c(w1 ·) + a·V) )

    where c(w1 w2) is the corpus bigram count, c(w1 ·) the count of w1
    as a bigram prefix (= sum of c(w1 w2) over w2, the consistent
    conditional denominator), and V the corpus vocabulary size. Low
    bits = predictable/common text; high bits = rare or garbled.

    Returns DataFrame[id_col, lm_bits_per_bigram] — one row per
    document with at least one bigram (>= 2 tokens).
    """
    inst = _doc_bigrams(docs, id_col, text_col)
    bcnt = inst.groupBy("bg").agg(F.count("*").alias("c_bg"))
    pcnt = (
        bcnt.select(F.split("bg", " ", -1).getItem(0).alias("w"), "c_bg")
        .groupBy("w")
        .agg(F.sum("c_bg").alias("c_w"))
    )
    vocab = docs.select(
        F.explode(F.split(text_col, " ", -1)).alias("tok")
    ).agg(F.countDistinct("tok").cast("double").alias("v"))

    nll = -F.log2(
        (F.col("c_bg") + F.lit(alpha)) / (F.col("c_w") + F.lit(alpha) * F.col("v"))
    )
    scored = (
        inst.join(bcnt, "bg")
        .withColumn("__w1", F.split("bg", " ", -1).getItem(0))
        .join(pcnt, F.col("__w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), nll.alias("nll"))
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("nll"), round_to).alias("lm_bits_per_bigram")
    )


def bigram_lm_sql(
    table: str = "documents",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> str:
    """The exact ANSI-SQL twin of :func:`bigram_lm_scores` (DuckDB
    dialect for list ops), for the driver's value-hash oracle."""
    return f"""
WITH toks AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {table}
), inst AS (
  SELECT {id_col},
         unnest(list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]),
                               x -> x[1] || ' ' || x[2])) AS bg
  FROM toks
), cnt AS (
  SELECT bg, COUNT(*) AS c_bg FROM inst GROUP BY bg
), pre AS (
  SELECT string_split(bg, ' ')[1] AS w, SUM(c_bg) AS c_w FROM cnt GROUP BY w
), voc AS (
  SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
  FROM (SELECT unnest(string_split({text_col}, ' ')) AS tok FROM {table})
)
SELECT {id_col},
       ROUND(AVG(-log2((c_bg + {alpha}) / (c_w + {alpha} * v))), {round_to}) AS lm_bits_per_bigram
FROM inst
JOIN cnt USING (bg)
JOIN pre ON string_split(bg, ' ')[1] = pre.w
CROSS JOIN voc
GROUP BY {id_col}
"""


def boilerplate_fraction(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Boilerplate contamination score: the fraction of a document's
    distinct word ``n``-grams that are corpus-frequent (document
    frequency >= ``min_df``) — headers, license banners, navigation
    chrome and template text score high and get filtered or cleaned.

    Returns DataFrame[id_col, boiler_frac] — one row per document with
    at least one ``n``-gram (>= n tokens; shorter docs have no signal).

    Scale: per-doc distinct shingles (word_ngrams) → DF count (two
    partial-aggregatable groupBys) → the >= min_df head joined back.
    The join probe side is the per-doc distinct shingle list; the
    build side (frequent shingles) is the head of the DF distribution.
    """
    sh = word_ngrams(docs, n=n, id_col=id_col, text_col=text_col)
    boiler = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("shingle")
    )
    tot = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    hit = sh.join(boiler, "shingle").groupBy(id_col).agg(
        F.count("*").alias("n_boiler")
    )
    return tot.join(hit, id_col, "left").select(
        F.col(id_col),
        F.round(
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double") / F.col("n_sh"),
            round_to,
        ).alias("boiler_frac"),
    )


def boilerplate_sql(
    table: str = "documents",
    n: int = 3,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> str:
    """ANSI-SQL twin of :func:`boilerplate_fraction` (DuckDB list ops),
    using the same shingle construction as the decontaminate oracle —
    except the tokenizer is a regex split to match word_ngrams' \\s+
    contract exactly (the pack_sequences lesson: a single-space oracle
    silently diverges on multi-whitespace text)."""
    gram = " || ' ' || ".join(
        ["x"] + [f"w[i+{j}]" for j in range(1, n)]
    )
    return rf"""
WITH toks AS (
  SELECT {id_col}, string_split_regex({text_col}, '\s+') AS w FROM {table}
), sh AS (
  SELECT DISTINCT {id_col},
         unnest(CASE WHEN len(w) >= {n}
                     THEN list_transform(w[1:len(w)-{n - 1}], (x, i) -> {gram})
                     ELSE CAST([] AS VARCHAR[]) END) AS shingle
  FROM toks
), boiler AS (
  SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
  WHERE df >= {min_df}
), tot AS (
  SELECT {id_col}, COUNT(*) AS n_sh FROM sh GROUP BY {id_col}
), hit AS (
  SELECT {id_col}, COUNT(*) AS n_boiler FROM sh JOIN boiler USING (shingle)
  GROUP BY {id_col}
)
SELECT tot.{id_col},
       ROUND(CAST(COALESCE(n_boiler, 0) AS DOUBLE) / n_sh, {round_to}) AS boiler_frac
FROM tot LEFT JOIN hit ON tot.{id_col} = hit.{id_col}
"""
