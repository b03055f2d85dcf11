"""Code-quality filtering for source-file corpora (the graft's payload):
per-file line-shape / comment / alphanumeric heuristics in the
StarCoder-BigCode style, plus a keep/drop decision with a reason
bitmask — the decision record a training-data pipeline persists next
to the corpus so every drop is auditable.

Reference parity note: the reference engine has no code-quality layer
(it consumes already-clean RDF); this module is part of the
training-data operator family the graft adds on top (north_star:
"Iceberg table of source-code repositories").

Scale design: every metric is a native expression over the ``content``
column — split / transform / aggregate array lambdas, regexp_replace,
contains — so the whole operator is a narrow projection: ZERO shuffles,
zero Python, linear scale-out, and column pruning reaches the scan
(only ``content`` + keys are read). At 10^12 files the only cost is the
scan itself.

Reason bits (stable public contract, mirrors the oracle SQL):

- ``1``  AUTOGEN        — generated-file marker (``DO NOT EDIT``)
- ``2``  LONG_LINE      — max line length > ``max_line`` (default 120)
- ``4``  COMMENT_HEAVY  — comment-line fraction > ``max_comment_frac``
- ``8``  LOW_ALNUM      — alphanumeric char fraction < ``min_alnum_frac``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

AUTOGEN = 1
LONG_LINE = 2
COMMENT_HEAVY = 4
LOW_ALNUM = 8

AUTOGEN_MARKER = "DO NOT EDIT"
#: comment-line prefixes recognised across the corpus's languages
COMMENT_PREFIXES = ("#", "//")


def _is_comment(line: Column) -> Column:
    c = F.ltrim(line)
    out = F.lit(False)
    for p in COMMENT_PREFIXES:
        out = out | c.startswith(p)
    return out


def code_quality_metrics(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append per-file shape metrics to ``df``.

    Columns added: ``n_lines``, ``max_line_len``, ``avg_line_len`` (4dp),
    ``comment_frac`` (4dp), ``alnum_frac`` (4dp), ``is_autogen``.
    Narrow (no shuffle); all-ASCII and multibyte content both measured
    in characters (Spark ``length`` = chars, matching the oracle).
    """
    content = F.col(content_col)
    lines = F.split(content, "\n", -1)
    n_lines = F.size(lines)
    lens = F.transform(lines, F.length)
    body_chars = F.aggregate(lens, F.lit(0), lambda a, x: a + x)
    n_comment = F.size(F.filter(lines, _is_comment))
    alnum = F.length(F.regexp_replace(content, "[^A-Za-z0-9]", ""))
    return df.select(
        "*",
        n_lines.cast("long").alias("n_lines"),
        F.array_max(lens).cast("long").alias("max_line_len"),
        F.round(body_chars.cast("double") / n_lines, 4).alias("avg_line_len"),
        F.round(n_comment.cast("double") / n_lines, 4).alias("comment_frac"),
        F.round(alnum.cast("double") / F.length(content), 4).alias("alnum_frac"),
        content.contains(AUTOGEN_MARKER).alias("is_autogen"),
    )


def code_quality_filter(
    df: DataFrame,
    content_col: str = "content",
    max_line: int = 120,
    max_comment_frac: float = 0.35,
    min_alnum_frac: float = 0.25,
) -> DataFrame:
    """Metrics + keep/drop decision with a reason bitmask.

    ``reasons == 0`` ⇔ ``keep``; each set bit names the violated rule
    (module constants). Thresholds default to the published
    StarCoder-style heuristics adapted to line-shape signals.
    """
    m = code_quality_metrics(df, content_col)
    reasons = (
        F.when(F.col("is_autogen"), AUTOGEN).otherwise(0)
        + F.when(F.col("max_line_len") > max_line, LONG_LINE).otherwise(0)
        + F.when(F.col("comment_frac") > max_comment_frac, COMMENT_HEAVY).otherwise(0)
        + F.when(F.col("alnum_frac") < min_alnum_frac, LOW_ALNUM).otherwise(0)
    )
    return m.withColumn("reasons", reasons.cast("int")).withColumn(
        "keep", F.col("reasons") == 0
    )
