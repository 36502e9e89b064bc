"""Fuzzy term lookup (olaf_spark/fuzzy.py): the generated edit-distance-1
neighborhood must be EXACTLY the Levenshtein<=1 ball over the tokenizer
alphabet (property-tested), and the fuzzy BM25 path must equal an explicit
OR-query over the matched vocabulary terms."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from olaf_spark.config import EngineConfig
from olaf_spark.fuzzy import ALPHABET, edit1_variants, fuzzy_query_terms


def levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


terms = st.text(alphabet=ALPHABET, min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(probe=terms, cand=terms)
def test_edit1_ball_exact(probe, cand):
    assert (cand in edit1_variants(probe)) == (levenshtein(probe, cand) <= 1)


@settings(max_examples=50, deadline=None)
@given(probe=terms)
def test_edit1_members_all_within_1(probe):
    for v in edit1_variants(probe):
        assert levenshtein(probe, v) <= 1 and v


def test_fuzzy_matches_vocabulary(spark):
    """'sow' must resolve to exactly {row, slow} against a corpus containing
    both, and the fuzzy qidf must feed the standard scorer unchanged."""
    from olaf_spark.scorer import bm25_scores, postings_flat_df, topk

    docs = spark.createDataFrame(
        [
            (0, "slow row table"),
            (1, "row row row fast"),
            (2, "slow slow query"),
            (3, "nothing shared here"),
        ],
        "doc_id long, text string",
    )
    pf = postings_flat_df(docs).cache()
    stats = pf.groupBy("term").count().withColumnRenamed("count", "df")
    qidf = fuzzy_query_terms(stats, 4, "sow")
    assert [t for t, _ in qidf] == ["row", "slow"]
    hits = topk(bm25_scores(pf, qidf, 3.0, EngineConfig()), 4).collect()
    got = {r["doc_id"] for r in hits}
    assert got == {0, 1, 2}


def test_fuzzy_query_index_matches_adhoc(spark, tmp_path):
    """Fuzzy probe against the materialized index == the ad-hoc DataFrame
    fuzzy scorer (same variants, same idf per matched term)."""
    import math

    from olaf_spark.fuzzy import fuzzy_query_index
    from olaf_spark.indexer import build_index
    from olaf_spark.scorer import bm25_scores, postings_flat_df, topk
    from olaf_spark.synth import gen_pages

    docs = gen_pages(spark, 150, seed=11).select("doc_id", "text")
    cfg = EngineConfig(block_size=8)
    ix = build_index(spark, docs, str(tmp_path / "ix"), cfg, n_buckets=4)
    probe = "w2x"  # ED-1 ball covers w2, w20..w29, ...
    got = fuzzy_query_index(spark, ix, probe, k=10)
    assert got, "probe should match vocabulary terms"

    pf = postings_flat_df(docs, cfg=cfg).cache()
    stats = pf.groupBy("term").count().withColumnRenamed("count", "df")
    qidf = fuzzy_query_terms(stats, ix.n_docs, probe)
    assert len(qidf) > 1
    want = [
        (r["doc_id"], r["score"])
        for r in topk(bm25_scores(pf, qidf, ix.avgdl, cfg), 10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-15)
