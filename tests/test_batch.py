"""Distributed batch BM25 (olaf_spark/batch.py): rank/score identity with
the driver-side serving scorer, single-job execution (no per-query Spark
job — Olaf's bulk-query protocol, eval/olaf_benchmark/olaf_benchmark.rb:
76-81), and a plan whose top-k is a WindowGroupLimit (map-side partial
top-k per query), never a full per-query sort."""

from __future__ import annotations

import math

import pytest

from olaf_spark.batch import batch_query_index
from olaf_spark.config import EngineConfig
from olaf_spark.indexer import build_index
from olaf_spark.synth import gen_pages
from olaf_spark.wand import query_index

N_DOCS = 200
K = 10
CFG = EngineConfig(block_size=8)
QUERIES = [
    (0, "w1 w50 w1000"),
    (1, "w2 w17 w300"),
    (2, "needle97 w2"),
    (3, "w3 w5 w7 w11"),
    (4, "zzz-not-in-corpus"),
]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    docs = gen_pages(spark, N_DOCS, seed=42).select("doc_id", "text")
    d = str(tmp_path_factory.mktemp("batch") / "ix")
    return build_index(spark, docs, d, CFG, n_buckets=4)


def collect_batch(spark, index, queries, k=K, **kw):
    rows = batch_query_index(spark, index, queries, k=k, **kw).collect()
    out: dict[int, list[tuple[int, float]]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


def test_batch_matches_serving_scorer_exactly(spark, index):
    got = collect_batch(spark, index, QUERIES)
    for qid, text in QUERIES:
        want = query_index(spark, index, text, k=K)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (qid, have, want)
        for (hd, hs), (wd, ws) in zip(have, want):
            # batch folds in exact oracle order (sequential ascending-term
            # float64); the vectorized serving scorer's np.add.reduceat is
            # pairwise -> within 1 ulp of that, hence isclose not ==
            assert math.isclose(hs, ws, rel_tol=1e-12, abs_tol=1e-15), (qid, hd, hs, ws)


def test_batch_rejects_duplicate_query_ids(spark, index):
    """query_id is the result key: a duplicate would silently overwrite
    (or, in the round-3 append semantics, double-count shared terms) —
    refused loudly instead."""
    with pytest.raises(ValueError, match="duplicate query_id"):
        batch_query_index(spark, index, [(1, "w2"), (1, "w3")], k=K)


def test_equal_term_set_queries_share_one_rep(spark, index):
    """BM25 depends only on the distinct-term SET: queries with equal sets
    (any order, any duplication) dedup into one representative driver-side
    and every query_id still gets its full identical result rows back
    through the mapping join."""
    got = collect_batch(
        spark, index, [(0, "w1 w50"), (9, "w50 w1 w50"), (3, "w2 w17 w300")]
    )
    assert got[0] == got[9]
    assert got[0] and got[0] == collect_batch(spark, index, [(0, "w1 w50")])[0]
    assert got[3] == collect_batch(spark, index, [(3, "w2 w17 w300")])[3]


def test_no_term_query_absent_from_output(spark, index):
    got = collect_batch(spark, index, QUERIES)
    assert 4 not in got  # no corpus term -> no rows for that query
    assert batch_query_index(spark, index, [], k=K).count() == 0


def test_one_job_for_the_whole_batch(spark, index):
    """Job count must not grow with batch size: B queries = one plan, one
    scan, one aggregation — never a per-query Spark job."""
    tracker = spark.sparkContext.statusTracker()

    def n_jobs_for(queries):
        before = len(tracker.getJobIdsForGroup(None) or [])
        batch_query_index(spark, index, queries, k=K).collect()
        return len(tracker.getJobIdsForGroup(None) or []) - before

    small = n_jobs_for(QUERIES[:1])
    large = n_jobs_for(QUERIES)
    assert large == small, (small, large)


def test_batch_plan_shape(spark, index):
    """Partition pruning reaches the scan; top-k is a WindowGroupLimit
    (map-side partial top-k), not a full per-query sort; exactly two
    MapInPandas steps (decode proxies, then score+partial-top-k after the
    doc_id exchange — the round-6 decide-with-small-rows shape); the
    query fan-out is a broadcast join of the tiny rep->query_id mapping,
    never a shuffle; no row-at-a-time Python."""
    df = batch_query_index(spark, index, QUERIES, k=K)
    jdf = df._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = jdf.queryExecution().explainString(mode)
    import re

    assert "WindowGroupLimit" in p, p
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 2, p
    assert "BatchEvalPython" not in p
    assert re.search(r"hashpartitioning\(doc_id#\d+L", p), p
    assert "BroadcastHashJoin" in p, p
    assert re.search(r"PartitionFilters: \[tb#\d+ IN", p), p
    assert "PushedFilters: [In(term_id" in p, p


def test_group_batch_matches_clean_rebuild_batch(spark, index, tmp_path):
    """Distributed batch over a LIVE group (half built, half appended) must
    be rank/score-identical to (a) the single-index batch over a clean
    rebuild of the union corpus and (b) the group's driver-side serving —
    the delta phase is invisible to the bulk path too."""
    from olaf_spark.batch import batch_query_index_group
    from olaf_spark.incremental import IndexGroup, append_index

    docs = gen_pages(spark, N_DOCS, seed=42).select("doc_id", "text")
    base = str(tmp_path / "gix")
    build_index(spark, docs.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    append_index(spark, docs.where("doc_id % 2 = 1"), base, n_buckets=4)
    group = IndexGroup.load(base)

    rows = batch_query_index_group(spark, group, QUERIES, k=K).collect()
    got: dict[int, list[tuple[int, float]]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))

    clean = collect_batch(spark, index, QUERIES)  # index = full-corpus build
    assert set(got) == set(clean)
    for qid, text in QUERIES:
        want = clean.get(qid, [])
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (qid, have, want)
        for (hd, hs), (wd, ws) in zip(have, want):
            assert math.isclose(hs, ws, rel_tol=1e-12, abs_tol=1e-15), (qid, hd, hs, ws)
        serve = group.topk(text, K)
        assert [d for d, _ in have] == [d for d, _ in serve]


def test_group_batch_plan_shape(spark, index, tmp_path):
    """Group batch plan: BOTH part scans partition-pruned on tb with
    term_id row-group pushdown, exactly one MapInPandas decode above the
    union, WindowGroupLimit top-k, no row-at-a-time Python."""
    import re

    from olaf_spark.batch import batch_query_index_group
    from olaf_spark.incremental import IndexGroup, append_index

    docs = gen_pages(spark, N_DOCS, seed=42).select("doc_id", "text")
    base = str(tmp_path / "gplan")
    build_index(spark, docs.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    append_index(spark, docs.where("doc_id % 2 = 1"), base, n_buckets=4)
    df = batch_query_index_group(spark, IndexGroup.load(base), QUERIES, k=K)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert "WindowGroupLimit" in p, p
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 2, p
    assert "BatchEvalPython" not in p
    assert len(re.findall(r"PartitionFilters: \[tb#\d+ IN", p)) == 2, p
    assert p.count("PushedFilters: [In(term_id") == 2, p


def test_group_batch_respects_tombstones(spark, index, tmp_path):
    from olaf_spark.batch import batch_query_index_group
    from olaf_spark.incremental import IndexGroup, append_index

    docs = gen_pages(spark, N_DOCS, seed=42).select("doc_id", "text")
    base = str(tmp_path / "gdel")
    build_index(spark, docs.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    append_index(spark, docs.where("doc_id % 2 = 1"), base, n_buckets=4)
    group = IndexGroup.load(base)
    victim = group.topk("needle97", 1)[0][0]
    group.delete_docs([victim])
    rows = batch_query_index_group(spark, group, [(0, "needle97 w2")], k=K).collect()
    assert all(r["doc_id"] != victim for r in rows)


def test_batch_respects_tombstones_and_min_score(spark, index):
    victim = query_index(spark, index, "needle97", k=1)[0][0]
    index.delete_docs([victim])
    try:
        got = collect_batch(spark, index, [(0, "needle97 w2")])
        assert all(d != victim for d, _ in got.get(0, []))
        full = collect_batch(spark, index, [(7, "w1 w50")], k=K)[7]
        theta = full[2][1]
        cut = collect_batch(spark, index, [(7, "w1 w50")], k=K, min_score=theta)[7]
        assert cut == full[:3]
    finally:
        index.undelete_docs([victim])
