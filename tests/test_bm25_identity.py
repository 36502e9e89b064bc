"""Rank identity: Spark BM25 top-k vs the pure-Python oracle engine.

Mirrors the reference's golden QUERY_EXPECTATIONS pattern
(tests/olaf_functional_tests.zig:314-326): every query's top-k doc_ids and
scores must match the trivially-correct referent; planted needles must hit
their known doc; OOV queries yield the empty sentinel.
"""

from __future__ import annotations

import math

import pytest

from olaf_spark.oracle import OracleIndex
from olaf_spark.scorer import AdhocIndex, bm25_topk_adhoc
from olaf_spark.synth import gen_pages, gen_queries

N_DOCS = 120
K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    pages = gen_pages(spark, N_DOCS, seed=42).select("doc_id", "text", "url").cache()
    docs = [(r["doc_id"], r["text"]) for r in pages.collect()]
    oracle = OracleIndex.build(docs)
    index = AdhocIndex(spark, pages)
    return pages, oracle, index


def assert_rank_identical(spark_rows, oracle_topk):
    got = [(r["doc_id"], r["score"]) for r in spark_rows]
    assert len(got) == len(oracle_topk)
    for (gd, gs), (od, osc) in zip(got, oracle_topk):
        assert gd == od, (got, oracle_topk)
        assert math.isclose(gs, osc, rel_tol=1e-9, abs_tol=1e-12), (gd, gs, osc)


def test_hand_computed_bm25():
    """3-doc corpus, hand-computed BM25 to 1e-9 (FIXTURES.md §4)."""
    docs = [(0, "cat dog"), (1, "cat cat fish"), (2, "bird")]
    ix = OracleIndex.build(docs)
    # N=3, avgdl=2.0; term 'cat': df=2, idf=ln(1+(3-2+0.5)/(2+0.5))=ln(1.6)
    idf_cat = math.log(1.6)
    # doc 1: tf=2, dl=3 -> 2*2.2/(2+1.2*(0.25+0.75*1.5))
    w1 = idf_cat * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.0))
    w0 = idf_cat * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.0))
    got = ix.topk("cat", 10)
    assert [d for d, _ in got] == [1, 0]
    assert math.isclose(got[0][1], w1, rel_tol=1e-12)
    assert math.isclose(got[1][1], w0, rel_tol=1e-12)


def test_spark_rank_identical_to_oracle(spark, corpus):
    pages, oracle, index = corpus
    queries = [r["query_text"] for r in gen_queries(spark, pages.select("doc_id", "text"), 8).collect()]
    assert queries
    for q in queries[:12]:
        rows = index.topk(q, k=K).collect()
        assert_rank_identical(rows, oracle.topk(q, K))


def test_needle_hits_planted_doc(spark, corpus):
    pages, oracle, index = corpus
    rows = index.topk("needle97", k=5).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 97
    assert oracle.topk("needle97", 5)[0][0] == 97


def test_oov_query_empty_sentinel(spark, corpus):
    """Empty-match sentinel analogue (olaf_fp_matcher.c:335-338)."""
    pages, oracle, index = corpus
    rows = index.topk("zzqxnothere", k=5).collect()
    assert rows == []
    assert oracle.topk("zzqxnothere", 5) == []


def test_topk_tie_break_doc_id_asc(spark):
    """Equal-score docs rank by doc_id asc (determinism gap the reference has;
    bounded top-k src/olaf_fp_matcher.c:275-309)."""
    docs = [(i, "same text here") for i in (5, 3, 9, 1)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bm25_topk_adhoc(spark, df, "same", k=3).collect()
    assert [r["doc_id"] for r in rows] == [1, 3, 5]
    assert [r["rank"] for r in rows] == [1, 2, 3]
