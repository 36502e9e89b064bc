"""Structured Streaming tests: watermark windowed agg, stateful accumulator
with TTL, and foreachBatch BM25 serving — driven synchronously with the
memory sink + processAllAvailable (no wall-clock flakiness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olaf_spark.streaming import (
    stateful_match_accumulator,
    stream_bm25_queries,
    windowed_event_counts,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
HITS_SCHEMA = "doc_id long, ts timestamp"


@pytest.fixture()
def stream_dir(tmp_path):
    return str(tmp_path / "in")


def _write_batch(spark, schema, rows, path, name):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_with_watermark(spark, stream_dir):
    rows = [
        (1, "2024-01-01 00:00:05", 1, "click", 1.0),
        (2, "2024-01-01 00:00:15", 1, "click", 2.0),
        (3, "2024-01-01 00:00:35", 2, "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string, value double")
    df.withColumn("ts", F.to_timestamp("ts")).write.parquet(stream_dir)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    )
    agg = windowed_event_counts(stream, "30 seconds", "10 seconds")
    # complete mode: emits every window each trigger (append would emit only
    # watermark-closed windows, which a single availableNow batch never sees;
    # TTL/eviction behavior is covered by the stateful accumulator test)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_out").collect()
    got = {(str(r["win_start"]), r["event_type"]): (r["n_events"], r["sum_value"]) for r in rows}
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 00:00:30", "view")] == (1, 3.0)


def test_stateful_accumulator_across_batches(spark, stream_dir):
    b1 = [(7, "2024-01-01 00:00:01"), (7, "2024-01-01 00:00:02"), (9, "2024-01-01 00:00:03")]
    spark.createDataFrame(b1, "doc_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    ).coalesce(1).write.parquet(stream_dir)

    stream = spark.readStream.schema(HITS_SCHEMA).parquet(stream_dir)
    acc = stateful_match_accumulator(stream)
    q = (
        acc.writeStream.outputMode("update")
        .format("memory")
        .queryName("acc_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r["doc_id"]: r["match_count"] for r in spark.sql("select * from acc_out").collect()}
        assert got1 == {7: 2, 9: 1}

        b2 = [(7, "2024-01-01 00:00:10")]
        spark.createDataFrame(b2, "doc_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        rows = spark.sql("select * from acc_out").collect()
        # state carried across batches: doc 7 now counts 3
        assert any(r["doc_id"] == 7 and r["match_count"] == 3 for r in rows)

        # TTL eviction (keepMatchesFor analogue): an event far past the TTL
        # advances the watermark, evicting old state — a later doc-7 hit
        # restarts its tally at 1 instead of continuing at 4
        b3 = [(999, "2024-01-01 01:00:00")]
        spark.createDataFrame(b3, "doc_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        b4 = [(7, "2024-01-01 01:00:05")]
        spark.createDataFrame(b4, "doc_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        latest_7 = [r["match_count"] for r in spark.sql(
            "select * from acc_out").collect() if r["doc_id"] == 7]
        assert 1 in latest_7 and 4 not in latest_7
    finally:
        q.stop()


def test_stream_queries_see_live_deltas(spark, tmp_path):
    """An append landing MID-STREAM is visible to later micro-batches: the
    serving handler re-checks the delta directory every batch (a cheap
    listing) and routes through IndexGroup — live-store read semantics
    (src/olaf_db.c:309-311). Before the append the needle query finds
    nothing; after it, the appended doc ranks first."""
    from olaf_spark.config import EngineConfig
    from olaf_spark.incremental import append_index
    from olaf_spark.indexer import build_index
    from olaf_spark.synth import gen_pages

    pages = gen_pages(spark, 200, seed=11).select("doc_id", "text")
    base = str(tmp_path / "ix")
    index = build_index(
        spark, pages.where("doc_id < 97"), base, EngineConfig(), n_buckets=4
    )

    qdir = str(tmp_path / "queries")
    spark.createDataFrame(
        [(1, "needle97")], "query_id long, query_text string"
    ).coalesce(1).write.parquet(qdir)
    stream = spark.readStream.schema("query_id long, query_text string").parquet(qdir)
    results, handle = stream_bm25_queries(spark, stream, index, k=3)
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
        assert results == []  # doc 97 not ingested yet -> no hits

        append_index(spark, pages.where("doc_id >= 97"), base, n_buckets=4)
        spark.createDataFrame(
            [(2, "needle97")], "query_id long, query_text string"
        ).coalesce(1).write.mode("append").parquet(qdir)
        q.processAllAvailable()
        hits2 = [(rank, doc) for qid, rank, doc, _ in results if qid == 2]
        assert (1, 97) in hits2, results
    finally:
        q.stop()


def test_stream_phrase_queries_see_live_deltas(spark, tmp_path):
    """Streamed PHRASE serving (round 5): a with_positions append landing
    mid-stream is visible to later micro-batches — phrase_topk re-lists
    the delta dir per call, so the handler needs no cache at all. The
    needle phrase (last two tokens of doc 142) matches nothing before the
    append and exactly doc 142 after it."""
    from olaf_spark.config import EngineConfig
    from olaf_spark.incremental import append_index
    from olaf_spark.indexer import build_index
    from olaf_spark.phrase import build_positions
    from olaf_spark.streaming import stream_phrase_queries
    from olaf_spark.synth import gen_pages

    pages = gen_pages(spark, 200, seed=11).select("doc_id", "text").cache()
    needle_doc = 142
    needle_phrase = " ".join(
        dict((r["doc_id"], r["text"]) for r in pages.collect())[needle_doc].split()[-2:]
    )
    base = str(tmp_path / "pix")
    old = pages.where(f"doc_id < {needle_doc}")
    build_index(spark, old, base, EngineConfig(), n_buckets=4)
    build_positions(spark, old, base, EngineConfig(), n_buckets=4)

    qdir = str(tmp_path / "pq")
    spark.createDataFrame(
        [(1, needle_phrase)], "query_id long, query_text string"
    ).coalesce(1).write.parquet(qdir)
    stream = spark.readStream.schema("query_id long, query_text string").parquet(qdir)
    results, handle = stream_phrase_queries(spark, stream, base, k=5)
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
        assert all(qid != 1 or doc != needle_doc for qid, _, doc, _ in results) or not results

        append_index(
            spark, pages.where(f"doc_id >= {needle_doc}"), base,
            n_buckets=4, with_positions=True,
        )
        spark.createDataFrame(
            [(2, needle_phrase)], "query_id long, query_text string"
        ).coalesce(1).write.mode("append").parquet(qdir)
        q.processAllAvailable()
        hits2 = [(rank, doc) for qid, rank, doc, _ in results if qid == 2]
        assert any(doc == needle_doc for _, doc in hits2), (needle_phrase, results)
    finally:
        q.stop()


def test_fat_microbatch_routes_through_batch_path(spark, tmp_path):
    """A micro-batch with >= batch_threshold queries must route through the
    distributed batch scorer — ONE Spark job for the whole batch (flat in
    B), with results identical to the per-row serving loop."""
    from olaf_spark.config import EngineConfig
    from olaf_spark.indexer import build_index
    from olaf_spark.streaming import stream_bm25_queries
    from olaf_spark.synth import gen_pages

    pages = gen_pages(spark, 120, seed=42).select("doc_id", "text")
    index = build_index(spark, pages, str(tmp_path / "ix"), EngineConfig(), n_buckets=4)

    B = 64
    qrows = [
        (i, f"w2 w17 w{i % 40}" if i % 2 else f"needle0 w{i % 29}") for i in range(B)
    ]
    qdir = str(tmp_path / "queries")
    spark.createDataFrame(qrows, "query_id long, query_text string").coalesce(
        1
    ).write.parquet(qdir)
    stream = spark.readStream.schema("query_id long, query_text string").parquet(qdir)

    # serial referent (threshold above B -> per-row loop)
    ref_results, ref_handle = stream_bm25_queries(
        spark, stream, index, k=5, batch_threshold=B + 1
    )
    q = stream.writeStream.foreachBatch(ref_handle).trigger(availableNow=True).start()
    q.awaitTermination(180)

    fat_results, fat_handle = stream_bm25_queries(
        spark, stream, index, k=5, batch_threshold=B
    )
    # drive the handler directly with the full batch to count its jobs
    batch_df = spark.read.parquet(qdir)
    tracker = spark.sparkContext.statusTracker()
    # job-count calibration: one warm run (plan compile), then count
    fat_handle(batch_df, 0)
    fat_results.clear()
    before = len(tracker.getJobIdsForGroup(None) or [])
    fat_handle(batch_df, 1)
    n_jobs = len(tracker.getJobIdsForGroup(None) or []) - before
    # flat in B: the input collect + one batch plan + its result collect is
    # a handful of jobs regardless of B — the per-row loop would schedule
    # >= B (=64) jobs
    assert n_jobs <= 8, n_jobs

    by_q = lambda res: {  # noqa: E731
        qid: [(r, d) for q2, r, d, _ in sorted(res) if q2 == qid]
        for qid in {t[0] for t in res}
    }
    assert by_q(fat_results) == by_q(ref_results)
    # scores match too (identical scorer core)
    assert {
        (qid, rank, doc, round(s, 9)) for qid, rank, doc, s in fat_results
    } == {(qid, rank, doc, round(s, 9)) for qid, rank, doc, s in ref_results}


def test_foreachbatch_bm25_serving(spark, tmp_path):
    from olaf_spark.config import EngineConfig
    from olaf_spark.indexer import build_index
    from olaf_spark.synth import gen_pages

    pages = gen_pages(spark, 60, seed=42).select("doc_id", "text")
    index = build_index(spark, pages, str(tmp_path / "ix"), EngineConfig(), n_buckets=4)

    qdir = str(tmp_path / "queries")
    spark.createDataFrame(
        [(1, "needle0"), (2, "w2 w17")], "query_id long, query_text string"
    ).coalesce(1).write.parquet(qdir)
    stream = spark.readStream.schema("query_id long, query_text string").parquet(qdir)
    results, handle = stream_bm25_queries(spark, stream, index, k=3)
    q = stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination(180)
    by_q = {}
    for qid, rank, doc_id, score in results:
        by_q.setdefault(qid, []).append((rank, doc_id))
    assert by_q[1][0] == (1, 0)  # needle0 -> doc 0
    assert len(by_q[2]) == 3


def test_duplicate_query_ids_tolerated_both_paths(spark, tmp_path):
    """At-least-once upstreams replay query rows. The distributed batch
    scorer refuses duplicate query_ids, so the fat path must dedup before
    routing — and the per-row path must dedup THE SAME WAY, or the two
    paths stop being result-identical at the threshold boundary. One
    result set per distinct query_id either way; no failed epoch."""
    from olaf_spark.config import EngineConfig
    from olaf_spark.indexer import build_index
    from olaf_spark.streaming import stream_bm25_queries
    from olaf_spark.synth import gen_pages

    pages = gen_pages(spark, 120, seed=42).select("doc_id", "text")
    index = build_index(spark, pages, str(tmp_path / "ix"), EngineConfig(), n_buckets=4)

    B = 64
    # every query_id appears TWICE with the same text (a pure replay)
    qrows = [(i % (B // 2), f"w2 w17 w{(i % (B // 2)) % 20}") for i in range(B)]
    qdir = str(tmp_path / "queries")
    spark.createDataFrame(qrows, "query_id long, query_text string").coalesce(
        1
    ).write.parquet(qdir)
    batch_df = spark.read.parquet(qdir)

    stream = spark.readStream.schema("query_id long, query_text string").parquet(qdir)
    fat_results, fat_handle = stream_bm25_queries(
        spark, stream, index, k=5, batch_threshold=B // 2
    )
    fat_handle(batch_df, 0)  # would raise 'duplicate query_id' unfixed
    slow_results, slow_handle = stream_bm25_queries(
        spark, stream, index, k=5, batch_threshold=B + 1
    )
    slow_handle(batch_df, 0)
    # round like test_fat_microbatch: the distributed fold's pairwise sum
    # differs from the serial scorer by <= 1 ulp
    r9 = lambda res: sorted(  # noqa: E731
        (qid, rank, doc, round(s, 9)) for qid, rank, doc, s in res
    )
    assert r9(fat_results) == r9(slow_results)
    # exactly one result set per distinct query_id, not two
    from collections import Counter

    per_q = Counter(qid for qid, rank, _, _ in fat_results if rank == 1)
    assert all(v == 1 for v in per_q.values()) and len(per_q) == B // 2


def test_conflicting_texts_for_one_query_id_refused():
    """Two DIFFERENT texts under one query_id are not a replay — silently
    answering only one (the r5 max-text pick) dropped a query; refused
    loudly instead (ADVICE r5)."""
    import pytest

    from olaf_spark.streaming import _dedup_query_rows

    rows = [
        {"query_id": 1, "query_text": "w2 w3"},
        {"query_id": 1, "query_text": "w2 w3"},  # exact replay: fine
        {"query_id": 2, "query_text": "w5"},
    ]
    assert _dedup_query_rows(rows, "query_text") == [(1, "w2 w3"), (2, "w5")]
    rows.append({"query_id": 2, "query_text": "w7"})
    with pytest.raises(ValueError, match="conflicting texts"):
        _dedup_query_rows(rows, "query_text")
