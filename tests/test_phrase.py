"""Positional side index + exact phrase queries (olaf_spark/phrase.py).

The text twin of Olaf's time-coherent matching: a phrase hit is a
time-aligned fingerprint sequence. Referent: a pure-Python position scan
over the same corpus — the phrase path must agree exactly on (doc,
phrase_tf) for planted and natural phrases, including repeated-term
phrases and across Arrow batch slicing.
"""

from __future__ import annotations

import re

import pytest

from olaf_spark.config import EngineConfig
from olaf_spark.phrase import build_positions, phrase_topk
from olaf_spark.synth import gen_pages

CFG = EngineConfig()


def py_phrase_tf(rows: list[tuple[int, str]], phrase: list[str]) -> dict[int, int]:
    """Reference: count exact-sequence occurrences per doc, pure Python."""
    out: dict[int, int] = {}
    for doc_id, text in rows:
        toks = [
            t
            for t in re.split(CFG.token_split_re, text.lower())
            if CFG.min_token_len <= len(t) <= CFG.max_token_len
        ]
        n = sum(
            1
            for i in range(len(toks) - len(phrase) + 1)
            if toks[i:i + len(phrase)] == phrase
        )
        if n:
            out[doc_id] = n
    return out


@pytest.fixture(scope="module")
def positional(spark, tmp_path_factory):
    pages = gen_pages(spark, 300, seed=42).select("doc_id", "text").cache()
    rows = [(r["doc_id"], r["text"]) for r in pages.collect()]
    d = str(tmp_path_factory.mktemp("phr") / "pix")
    build_positions(spark, pages, d, CFG, n_buckets=4)
    return rows, d


def assert_matches_referent(rows, d, phrase_text, k=10):
    want_tf = py_phrase_tf(rows, phrase_text.split())
    want = sorted(want_tf.items(), key=lambda x: (-x[1], x[0]))[:k]
    got = phrase_topk(d, phrase_text, k=k)
    assert got == want, (phrase_text, got[:5], want[:5])


def test_phrase_matches_python_referent(positional):
    rows, d = positional
    for phrase in ("w2 w3", "w3 w2 w2", "w17 w2", "w2 w2"):
        assert_matches_referent(rows, d, phrase)


def test_single_term_phrase_is_positionwise_tf(positional):
    rows, d = positional
    assert_matches_referent(rows, d, "w5", k=20)


def test_absent_and_partial_phrases_empty(positional):
    _, d = positional
    assert phrase_topk(d, "zzznothere w2") == []
    assert phrase_topk(d, "") == []


def test_needle_phrase_unique_doc(positional):
    rows, d = positional
    # needle is appended at the doc's end: "<last zipf token> needle97"
    doc97 = dict(rows)[97]
    last_two = doc97.split()[-2:]
    got = phrase_topk(d, " ".join(last_two), k=5)
    assert any(doc == 97 for doc, _ in got), (last_two, got)
    assert_matches_referent(rows, d, " ".join(last_two), k=5)


def test_phrase_over_live_group_equals_full_rebuild(spark, positional, tmp_path):
    """Delta-phase phrase serving: main indexed+positioned on half the
    corpus, the other half appended with with_positions=True — phrase
    answers must equal the full-corpus referent (positional rows are
    doc-disjoint; no cross-part statistics exist to go stale)."""
    from olaf_spark.incremental import append_index
    from olaf_spark.indexer import build_index

    rows, _ = positional
    pages = spark.createDataFrame(rows, "doc_id long, text string")
    base = str(tmp_path / "gp")
    build_index(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    build_positions(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    append_index(
        spark, pages.where("doc_id % 2 = 1"), base, n_buckets=4, with_positions=True
    )
    for phrase in ("w2 w3", "w3 w2 w2"):
        assert_matches_referent(rows, base, phrase)


def test_phrase_refuses_positionless_delta(spark, positional, tmp_path):
    """A delta without positional rows must FAIL the phrase query loudly —
    silently dropping its docs from phrase answers would be worse."""
    from olaf_spark.incremental import append_index
    from olaf_spark.indexer import build_index

    rows, _ = positional
    pages = spark.createDataFrame(rows[:80], "doc_id long, text string")
    base = str(tmp_path / "gnp")
    build_index(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=2)
    build_positions(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=2)
    append_index(spark, pages.where("doc_id % 2 = 1"), base, n_buckets=2)
    with pytest.raises(FileNotFoundError):
        phrase_topk(base, "w2 w3")


def test_phrase_respects_tombstones(spark, positional, tmp_path):
    """Merge-on-read deletes apply to phrase queries like every other path:
    a tombstoned doc must vanish from phrase results (and return on
    undelete)."""
    import shutil

    from olaf_spark.indexer import Index, build_index

    rows, d = positional
    pages = spark.createDataFrame(rows, "doc_id long, text string")
    ix_dir = str(tmp_path / "pts")
    build_index(spark, pages, ix_dir, CFG, n_buckets=2)
    # graft the positional rows onto the index dir so tombstones.json and
    # positions share one directory (the normal layout)
    for name in ("positions", "positions_meta.json"):
        src = f"{d}/{name}"
        dst = f"{ix_dir}/{name}"
        (shutil.copytree if name == "positions" else shutil.copyfile)(src, dst)
    before = phrase_topk(ix_dir, "w2 w3", k=5)
    assert before
    victim = before[0][0]
    ix = Index.load(ix_dir)
    ix.delete_docs([victim])
    after = phrase_topk(ix_dir, "w2 w3", k=5)
    assert all(doc != victim for doc, _ in after), (victim, after)
    ix.undelete_docs([victim])
    assert phrase_topk(ix_dir, "w2 w3", k=5) == before


def test_positions_survive_compaction(spark, positional, tmp_path):
    """Compaction folds the positional side index in the same job (r4):
    phrase queries answer IMMEDIATELY after compact_index — no manual
    positions rebuild, no dark window — identical to the pre-compact group
    answer, and tombstoned docs are PHYSICALLY dropped from the folded
    rows (the compacted index starts with an empty tombstone set, so their
    absence proves the drop)."""
    from olaf_spark.incremental import append_index, compact_index
    from olaf_spark.indexer import Index, build_index

    rows, _ = positional
    pages = spark.createDataFrame(rows, "doc_id long, text string")
    base = str(tmp_path / "pc")
    build_index(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    build_positions(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    append_index(
        spark, pages.where("doc_id % 2 = 1"), base, n_buckets=4, with_positions=True
    )
    before = phrase_topk(base, "w2 w3", k=10)
    assert before
    victim = before[0][0]
    Index.load(base).delete_docs([victim])
    want = {p: phrase_topk(base, p, k=10) for p in ("w2 w3", "w3 w2 w2", "w5")}
    out = str(tmp_path / "pc_out")
    compact_index(spark, base, out, n_groups=2)
    for p, w in want.items():
        got = phrase_topk(out, p, k=10)
        assert got == w, (p, got[:3], w[:3])
        assert all(d != victim for d, _ in got)


def test_phrase_min_tf_threshold_prunes_before_decode(positional):
    """min_tf (Olaf minMatchCount twin): results drop below-threshold docs
    exactly like a post-filter of the unthresholded answer, AND candidates
    whose min-term-tf bound can't reach the floor are never decoded (the
    skip criterion, not a post-filter)."""
    rows, d = positional
    want_tf = py_phrase_tf(rows, ["w2", "w3"])
    for min_tf in (2, 3):
        want = sorted(
            ((doc, tf) for doc, tf in want_tf.items() if tf >= min_tf),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        st: dict = {}
        got = phrase_topk(d, "w2 w3", k=10, min_tf=min_tf, _stats=st)
        assert got == want, (min_tf, got, want)
        st0: dict = {}
        phrase_topk(d, "w2 w3", k=10, _stats=st0)
        assert st["n_decoded"] <= st0["n_decoded"]
    # a floor nothing reaches: empty result, (almost) nothing decoded
    st: dict = {}
    assert phrase_topk(d, "w2 w3", k=10, min_tf=10**6, _stats=st) == []
    assert st["n_decoded"] == 0


def test_batch_phrase_rejects_duplicate_query_ids(spark, positional):
    """Two phrases under one query_id would interleave their subscriptions
    into one verify group and produce garbage — refused loudly (also for a
    duplicate where the first phrase tokenized to nothing)."""
    from olaf_spark.phrase import batch_phrase_topk

    _, d = positional
    with pytest.raises(ValueError, match="duplicate query_id"):
        batch_phrase_topk(spark, d, [(1, "w2 w3"), (1, "w5")], k=5)
    with pytest.raises(ValueError, match="duplicate query_id"):
        batch_phrase_topk(spark, d, [(1, ""), (1, "w5")], k=5)


def test_batch_phrase_duplicate_texts_replicate(spark, positional):
    """Equal token sequences dedup into one representative (fan-out,
    decode and verify run once) and the result rows replicate to every
    subscribed query_id — identical per-qid answers to serving."""
    from olaf_spark.phrase import batch_phrase_topk

    _, d = positional
    batch = [(0, "w2 w3"), (7, "w2 w3"), (1, "w5"), (2, "w2  w3")]
    got = batch_phrase_topk(spark, d, batch, k=10).collect()
    per_q: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        per_q.setdefault(r["query_id"], []).append((r["doc_id"], r["phrase_tf"]))
    assert per_q[0] == per_q[7] == per_q[2] == phrase_topk(d, "w2 w3", k=10)
    assert per_q[1] == phrase_topk(d, "w5", k=10)


def test_positions_usable_never_raises(tmp_path):
    """Graceful-degradation contract: malformed metas (missing, truncated,
    wrong JSON shape) are all 'not usable', never an exception — a raise
    here would make a half-finished compaction permanently un-completable."""
    from olaf_spark.phrase import positions_usable

    d = str(tmp_path)
    assert not positions_usable(d)  # missing
    meta = tmp_path / "positions_meta.json"
    meta.write_text("{trunca")
    assert not positions_usable(d)  # truncated
    meta.write_text("[1, 2]")
    assert not positions_usable(d)  # valid JSON, wrong shape
    meta.write_text('{"format_version": 2}')
    assert not positions_usable(d)  # stale layout


def test_batch_phrase_min_tf(spark, positional):
    """Batch phrase min_tf gate agrees with the serving path per query."""
    from olaf_spark.phrase import batch_phrase_topk

    _, d = positional
    batch = [(0, "w2 w3"), (1, "w3 w2 w2")]
    got = batch_phrase_topk(spark, d, batch, k=10, min_tf=2).collect()
    per_q: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        per_q.setdefault(r["query_id"], []).append((r["doc_id"], r["phrase_tf"]))
    for qid, text in batch:
        assert per_q.get(qid, []) == phrase_topk(d, text, k=10, min_tf=2), (qid, text)


def test_batch_phrase_matches_serving(spark, positional):
    """Distributed batch phrase (r4): B phrases as ONE Spark job must agree
    per query with driver-side phrase_topk — including repeated-term
    phrases, a single-term phrase, and an absent-term phrase (no rows)."""
    from olaf_spark.phrase import batch_phrase_topk

    rows, d = positional
    batch = [
        (0, "w2 w3"),
        (1, "w3 w2 w2"),
        (2, "w5"),
        (3, "zzznothere w2"),
        (4, "w17 w2"),
    ]
    got = batch_phrase_topk(spark, d, batch, k=10).collect()
    per_q: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        per_q.setdefault(r["query_id"], []).append((r["doc_id"], r["phrase_tf"]))
    for qid, text in batch:
        want = phrase_topk(d, text, k=10)
        assert per_q.get(qid, []) == want, (qid, text)


def test_batch_phrase_over_live_group_with_tombstones(spark, positional, tmp_path):
    """Batch phrase over main + delta applies the union tombstone snapshot,
    same per-query answers as group serving."""
    from olaf_spark.incremental import append_index
    from olaf_spark.indexer import Index, build_index
    from olaf_spark.phrase import batch_phrase_topk

    rows, _ = positional
    pages = spark.createDataFrame(rows, "doc_id long, text string")
    base = str(tmp_path / "bpg")
    build_index(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    build_positions(spark, pages.where("doc_id % 2 = 0"), base, CFG, n_buckets=4)
    append_index(
        spark, pages.where("doc_id % 2 = 1"), base, n_buckets=4, with_positions=True
    )
    victim = phrase_topk(base, "w2 w3", k=1)[0][0]
    Index.load(base).delete_docs([victim])
    batch = [(0, "w2 w3"), (1, "w3 w2 w2")]
    got = batch_phrase_topk(spark, base, batch, k=10).collect()
    per_q: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        per_q.setdefault(r["query_id"], []).append((r["doc_id"], r["phrase_tf"]))
    for qid, text in batch:
        assert per_q.get(qid, []) == phrase_topk(base, text, k=10), (qid, text)
        assert all(doc != victim for doc, _ in per_q.get(qid, []))


def test_batch_phrase_one_job_and_plan_shape(spark, positional):
    """Job count flat in B (one plan, one scan, one verify shuffle); top-k
    plans as WindowGroupLimit; tb partition pruning and term_id row-group
    pruning reach the positions scan; no row-at-a-time Python."""
    import re

    from olaf_spark.phrase import batch_phrase_topk

    _, d = positional
    batch = [(0, "w2 w3"), (1, "w3 w2 w2"), (2, "w5"), (3, "w17 w2")]
    tracker = spark.sparkContext.statusTracker()

    def n_jobs_for(queries):
        # warm pass first: AQE submits broadcast stages asynchronously and
        # one-time lazy work can attribute a job to whichever invocation
        # runs first — count a steady-state invocation only
        batch_phrase_topk(spark, d, queries, k=10).collect()
        before = len(tracker.getJobIdsForGroup(None) or [])
        batch_phrase_topk(spark, d, queries, k=10).collect()
        return len(tracker.getJobIdsForGroup(None) or []) - before

    assert n_jobs_for(batch) == n_jobs_for(batch[:1])

    df = batch_phrase_topk(spark, d, batch, k=10)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert "WindowGroupLimit" in p, p
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 1, p
    assert "FlatMapGroupsInPandas" in p, p
    assert "BatchEvalPython" not in p
    assert re.search(r"PartitionFilters: \[tb#\d+ IN", p), p
    assert "PushedFilters: [In(term_id" in p, p


def test_positions_write_one_file_per_tb(spark, positional):
    """The pre-write tb clustering (indexer.cluster_for_write) must hold:
    without it every pack task writes one file per tb it holds —
    n_tasks x n_segments files (measured 1024 at bench scale, each paying
    open/footer/commit on write and a footer on every serving read). With
    the clustering exchange and n_tasks <= n_segments, each non-empty tb
    is written by exactly one task: at most n_segments files."""
    import glob
    import os

    _, d = positional
    files = glob.glob(os.path.join(d, "positions", "tb=*", "*.parquet"))
    assert 0 < len(files) <= CFG.n_segments, len(files)


def test_positions_survive_small_arrow_batches(spark, positional, tmp_path):
    """Pack correctness independent of Arrow batch slicing (the
    _iter_term_chunks carry path)."""
    rows, _ = positional
    pages = spark.createDataFrame(rows, "doc_id long, text string")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        d = str(tmp_path / "pix_small")
        build_positions(spark, pages, d, CFG, n_buckets=4)
    finally:
        spark.conf.set(key, old)
    assert_matches_referent(rows, d, "w2 w3")
