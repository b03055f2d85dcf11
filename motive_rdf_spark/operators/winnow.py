"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
the MOSS algorithm) — the standard code near-duplicate / clone-
detection signal, complementing the word-shingle MinHash family
(operators/dedup.py) which tokenizes poorly on source code.

Semantics (documented exactly so the SQL oracle can mirror them):

1. every char ``k``-gram of ``content`` at 1-based position ``i``
   (``i <= len - k + 1``) gets hash ``h_i`` (portable md5-derived
   60-bit integer, the same family as dedup.minhash md5 mode);
2. for every window of ``w`` consecutive k-gram hashes
   (``i <= len - k - w + 2``), select ``min(h_i .. h_{i+w-1})``;
3. a document's fingerprint set = the DISTINCT selected values.

This is the set-semantics variant of winnowing (the paper's guarantee:
any shared substring of length >= k + w - 1 yields at least one shared
fingerprint; density ~ 2/(w+1)). Per-file profile output: fingerprint
count, count shared with >= 1 other file, and the shared fraction —
the clone-detection decision signal.

Reference parity note: beyond-reference training-data operator for the
code payload (the reference has no text layer at all).

Scale design (10^12 files): the k-gram explode is O(total bytes) rows
but NARROW (no shuffle) and immediately projected to (file, pos,
hash). The window min partitions BY FILE — task size is bounded by the
largest file, never the corpus. The fingerprint table is ~bytes/(w/2)
rows; the sharing join is a partial-aggregatable groupBy on the
fingerprint value (vocabulary-sized shuffle) + one semi-join back.
No driver collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def winnow_fingerprints(
    files: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "file_id",
    content_col: str = "content",
) -> DataFrame:
    """DataFrame[id_col, fp] — the distinct winnowing fingerprints per
    document (see module docstring for the exact rule)."""
    n_g = (F.length(content_col) - k + 1).cast("int")
    pos = files.select(
        F.col(id_col),
        F.col(content_col).alias("__c"),
        n_g.alias("__ng"),
        F.explode(
            F.when(n_g >= 1, F.sequence(F.lit(1), n_g)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("pos"),
    )
    gram = F.expr(f"substring(__c, pos, {k})")
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    hashed = pos.select(id_col, "__ng", "pos", h.alias("h"))
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        hashed.withColumn("fp", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("__ng") - w + 1)
        .select(id_col, "fp")
        .distinct()
    )


def winnow_profile(
    files: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "file_id",
    content_col: str = "content",
    round_to: int = 4,
) -> DataFrame:
    """Per-file clone-detection profile over the winnowing fingerprint
    sets: DataFrame[id_col, n_fp, n_shared, share_frac] where
    ``n_shared`` counts this file's fingerprints also present in at
    least one OTHER file and ``share_frac = n_shared / n_fp``
    (0.0 when the file is too short to fingerprint)."""
    fp = winnow_fingerprints(files, k, w, id_col, content_col)
    shared = (
        fp.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= 2)
        .select("fp")
    )
    n_fp = fp.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    n_sh = fp.join(shared, "fp").groupBy(id_col).agg(F.count("*").alias("n_shared"))
    base = files.select(id_col)
    return (
        base.join(n_fp, id_col, "left")
        .join(n_sh, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_fp"), F.lit(0)).cast("long").alias("n_fp"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_fp"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_shared"), F.lit(0)).cast("double")
                    / F.col("n_fp"),
                ).otherwise(0.0),
                round_to,
            ).alias("share_frac"),
        )
    )


def winnow_profile_sql(
    src_cte: str,
    k: int = 8,
    w: int = 4,
    id_expr: str = "k",
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`winnow_profile` (``src_cte`` must define
    ``src(k, content)``; positions via a LATERAL unnest(range))."""
    return f"""WITH {src_cte},
grams AS (
  SELECT s.{id_expr} AS file_id,
         length(s.content) - {k} + 1 AS ng,
         u.pos,
         (('0x' || substring(md5(substring(s.content, u.pos, {k})), 1, 15))::BIGINT) AS h
  FROM src s,
       LATERAL (SELECT unnest(range(1, length(s.content) - {k} + 2)) AS pos) u
),
sel AS (
  SELECT file_id, pos, ng,
         min(h) OVER (PARTITION BY file_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM grams
),
fps AS (
  SELECT DISTINCT file_id, fp FROM sel WHERE pos <= ng - {w} + 1
),
shared AS (
  SELECT fp FROM (SELECT fp, COUNT(DISTINCT file_id) AS df FROM fps GROUP BY fp)
  WHERE df >= 2
),
nf AS (SELECT file_id, COUNT(*) AS n_fp FROM fps GROUP BY file_id),
ns AS (
  SELECT file_id, COUNT(*) AS n_shared
  FROM fps WHERE fp IN (SELECT fp FROM shared) GROUP BY file_id
)
SELECT s.{id_expr} AS file_id,
       CAST(COALESCE(nf.n_fp, 0) AS BIGINT) AS n_fp,
       CAST(COALESCE(ns.n_shared, 0) AS BIGINT) AS n_shared,
       ROUND(CASE WHEN COALESCE(nf.n_fp, 0) > 0
                  THEN CAST(COALESCE(ns.n_shared, 0) AS DOUBLE) / nf.n_fp
                  ELSE 0.0 END, {round_to}) AS share_frac
FROM src s
LEFT JOIN nf ON nf.file_id = s.{id_expr}
LEFT JOIN ns ON ns.file_id = s.{id_expr}"""
