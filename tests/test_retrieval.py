"""BM25 scoring: hand-computed score on a 3-doc corpus, monotonicity
properties (tf saturation, idf ordering), and non-matching docs
excluded."""

from __future__ import annotations

import math

import pytest

from motive_rdf_spark.operators.retrieval import bm25_scores

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark table join"),            # 1x table
        (1, "table table scan plan"),       # 2x table
        (2, "python code here"),            # no query term
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected(tf: int, dl: int, avgdl: float, n: int, df: int) -> float:
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_bm25_hand_computed(docs):
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["table"]).collect()}
    avgdl = (3 + 4 + 3) / 3
    assert set(got) == {0, 1}  # doc 2 has no query term -> absent
    assert got[0] == round(_expected(1, 3, avgdl, 3, 2), 4)
    assert got[1] == round(_expected(2, 4, avgdl, 3, 2), 4)
    # higher tf wins despite longer doc
    assert got[1] > got[0]


def test_bm25_multi_term_is_sum(docs):
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["table", "spark"]).collect()}
    one = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["table"]).collect()}
    other = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert got[0] == round(one[0] + other[0], 4) or abs(
        got[0] - (one[0] + other[0])
    ) <= 1e-3  # rounding of parts vs whole
    assert got[1] == one[1]  # doc 1 has no 'spark'


def test_bm25_rare_term_outranks_common(spark):
    rows = [(i, "common filler") for i in range(8)] + [
        (100, "common rare"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["common", "rare"]).collect()}
    # doc 100 matches both; its score must exceed any common-only doc
    assert got[100] > max(v for k, v in got.items() if k != 100)


def test_bm25_empty_query_rejected(docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])
