"""Fuzzy term lookup (olaf_spark/fuzzy.py): the generated neighborhood
must be EXACTLY the Damerau-Levenshtein (OSA) <= 1 ball over the tokenizer
alphabet (property-tested — ins/del/sub + adjacent transposition), and the
fuzzy BM25 path must equal an explicit OR-query over the matched
vocabulary terms."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from olaf_spark.config import EngineConfig
from olaf_spark.fuzzy import ALPHABET, edit1_variants, fuzzy_query_terms


def osa_distance(a: str, b: str) -> int:
    """Optimal string alignment (restricted Damerau-Levenshtein) — the
    referent the generated ball is checked against; at distance <= 1 it
    coincides with unrestricted Damerau."""
    d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        d[i][0] = i
    for j in range(len(b) + 1):
        d[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            cost = a[i - 1] != b[j - 1]
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if (
                i > 1 and j > 1
                and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[len(a)][len(b)]


terms = st.text(alphabet=ALPHABET, min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(probe=terms, cand=terms)
def test_edit1_ball_exact(probe, cand):
    assert (cand in edit1_variants(probe)) == (osa_distance(probe, cand) <= 1)


@settings(max_examples=50, deadline=None)
@given(probe=terms)
def test_edit1_members_all_within_1(probe):
    for v in edit1_variants(probe):
        assert osa_distance(probe, v) <= 1 and v


def test_transpositions_in_ball():
    """The Damerau extension concretely: the swap-class typo is a member,
    a two-edit string is not."""
    assert "teh" in edit1_variants("the")
    assert "needle79" in edit1_variants("needle97")      # adjacent swap
    assert "enedle97" in edit1_variants("needle97")      # swap at the head
    assert "nedle79" not in edit1_variants("needle97")   # drop + swap = 2 edits


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
