"""Operator-level tests for the training-data pipeline ops (dedup,
similarity, text, multimodal) — planted-duplicate goldens, ANN recall vs
brute force, and binary-column plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from olaf_spark.ops.dedup import (
    embedding_near_dup_pairs,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_df,
)
from olaf_spark.ops.multimodal import frame_sample, image_meta, synth_media
from olaf_spark.ops.similarity import ann_lsh_topk, batch_cosine_topk, cosine_topk
from olaf_spark.tokenize import term_freqs_df

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup of 0
    (3, "completely different content about spark inverted index engines"),
    (4, "another unrelated document mentioning embeddings and vectors"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dup_groups(docs):
    rows = {r["keep_doc_id"]: r["n_copies"] for r in exact_dup_groups(docs).collect()}
    assert rows[0] == 2  # docs 0,1 identical
    assert rows[2] == 1 and rows[3] == 1


def test_ngram_jaccard_planted(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()}
    assert pairs[(0, 1)] == 1.0            # identical -> jaccard 1
    assert 0.5 < pairs[(0, 2)] < 1.0       # one word changed -> high overlap
    assert (0, 3) not in pairs             # nothing shared


def test_ngram_jaccard_shingle_cap_is_recall_knob(docs):
    """max_shingle_df drops ubiquitous shingles BEFORE the self-join:
    identical twins (all of whose shingles have df >= 2) vanish at cap=1 —
    exactly the documented recall trade — while the default cap (10k) is
    inert at small df and the capped candidate set is always a subset."""
    base = {(r["doc_a"], r["doc_b"]) for r in
            ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_shingle_df=None).collect()}
    dflt = {(r["doc_a"], r["doc_b"]) for r in
            ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()}
    assert dflt == base  # default cap inert below df 10_000
    capped = {(r["doc_a"], r["doc_b"]) for r in
              ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_shingle_df=1).collect()}
    assert (0, 1) not in capped
    assert capped <= base


def test_minhash_identical_signatures(docs):
    sig = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(16))
           for r in minhash_signatures(docs, n_hashes=16).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[3]
    # near-dup shares most minhashes
    shared = sum(a == b for a, b in zip(sig[0], sig[2]))
    assert shared >= 8


def test_minhash_lsh_pairs_finds_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(docs, n_hashes=16, bands=8).collect()}
    assert (0, 1) in pairs
    assert (3, 4) not in pairs


def test_simhash_identical_docs_equal(spark, docs):
    tf = term_freqs_df(docs)
    sh = {r["doc_id"]: r["simhash"] for r in simhash_df(tf, bits=32).collect()}
    assert sh[0] == sh[1]
    # near-dup hamming distance small, unrelated large
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(sh[0], sh[2]) <= ham(sh[0], sh[3])


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    base[1] = base[0] + 0.01 * rng.standard_normal(16)  # planted near-dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache(), base


def test_embedding_near_dups_planted(emb):
    df, _ = emb
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(df, 0.95).collect()}
    assert (0, 1) in pairs


def test_cosine_topk_matches_numpy(emb):
    df, base = emb
    q = base[0]
    sims = (base @ q) / (np.linalg.norm(base, axis=1) * np.linalg.norm(q))
    want = list(np.argsort(-np.round(sims, 6), kind="stable")[:5])
    got = [r["vec_id"] for r in cosine_topk(df, [float(x) for x in q], k=5).collect()]
    assert got == [int(w) for w in want]


def test_ann_lsh_recall(emb):
    df, base = emb
    q = [float(x) for x in base[0]]
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=5).collect()}
    approx = {r["vec_id"] for r in
              ann_lsh_topk(df, q, k=5, n_planes=4, n_probes=3).collect()}
    # recall@5 >= 0.6 on this tiny set with multiprobe
    assert len(exact & approx) >= 3


def test_lsh_near_dup_pairs_subset_and_recall(emb):
    """LSH near-dup = candidates (band bucket join) + exact verify: every
    emitted pair must also pass the brute-force referent at the same
    threshold (precision 1.0 by construction), the planted near-dup must be
    found, and recall vs brute force must clear a floor."""
    from olaf_spark.ops.similarity import embedding_near_dup_pairs_lsh

    df, _ = emb
    thr = 0.3
    brute = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in embedding_near_dup_pairs(df, thr).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine_sim"]
           for r in embedding_near_dup_pairs_lsh(df, thr, n_planes=8, bands=4).collect()}
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert v == brute[k]  # identical verify arithmetic
    assert (0, 1) in lsh  # planted near-dup (cos ~1) always shares all bands
    assert len(lsh) >= max(1, int(0.5 * len(brute))), (len(lsh), len(brute))


def test_lsh_candidates_bucket_cap(emb):
    """max_bucket_size drops over-full buckets BEFORE the self-join — the
    skew guard. Cap of 1 means no bucket can pair anything."""
    from olaf_spark.ops.similarity import lsh_candidate_pairs

    df, _ = emb
    uncapped = lsh_candidate_pairs(df, n_planes=4, bands=2).count()
    capped = lsh_candidate_pairs(df, n_planes=4, bands=2, max_bucket_size=1).count()
    assert uncapped > 0 and capped == 0


def test_ann_index_partition_pruning_and_recall(spark, emb, tmp_path):
    """Materialized signature layout: a probe's sig IN-list must prune hive
    partitions AT THE SCAN (no signature recompute over the corpus), and
    indexed multi-probe results must equal the ad-hoc LSH path's."""
    from olaf_spark.ops.similarity import ann_topk_indexed, build_ann_index

    df, base = emb
    d = str(tmp_path / "ann")
    build_ann_index(spark, df, d, n_planes=4, seed=42)
    q = [float(x) for x in base[0]]
    out = ann_topk_indexed(spark, d, q, k=5, n_probes=3)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = out._jdf.queryExecution().explainString(mode)
    import re

    assert re.search(r"PartitionFilters: \[sig#\d+ IN", p), p
    got = {r["vec_id"] for r in out.collect()}
    adhoc = {r["vec_id"] for r in
             ann_lsh_topk(df, q, k=5, n_planes=4, n_probes=3).collect()}
    assert got == adhoc
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=5).collect()}
    assert len(exact & got) >= 3  # recall floor, same as the ad-hoc test


def test_ann_index_append_and_tombstones(spark, emb, tmp_path):
    """ANN index maintenance (r4): an index built on HALF the vectors plus
    an appended delta over the other half must answer every probe exactly
    like an index built once over the full corpus (signatures are
    corpus-independent — no stats rescaling); deleted vectors vanish from
    single-query AND batch probes, and return on undelete."""
    from olaf_spark.ops.similarity import (
        ann_batch_topk_indexed,
        ann_topk_indexed,
        append_ann_index,
        build_ann_index,
        delete_vectors,
        undelete_vectors,
    )

    df, base = emb
    full_dir = str(tmp_path / "ann_full")
    live_dir = str(tmp_path / "ann_live")
    build_ann_index(spark, df, full_dir, n_planes=4, seed=42)
    build_ann_index(spark, df.where("vec_id % 2 = 0"), live_dir, n_planes=4, seed=42)
    append_ann_index(spark, df.where("vec_id % 2 = 1"), live_dir)

    # an empty batch must be refused BEFORE the delta claim — an empty
    # partitionBy write is unreadable and would poison every later probe
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        append_ann_index(spark, df.where("vec_id < 0"), live_dir)

    q = [float(x) for x in base[0]]
    want = [(r["vec_id"], r["cosine_sim"])
            for r in ann_topk_indexed(spark, full_dir, q, k=5, n_probes=3).collect()]
    got = [(r["vec_id"], r["cosine_sim"])
           for r in ann_topk_indexed(spark, live_dir, q, k=5, n_probes=3).collect()]
    assert got == want

    victim = got[0][0]
    delete_vectors(live_dir, [victim])
    after = [r["vec_id"]
             for r in ann_topk_indexed(spark, live_dir, q, k=5, n_probes=3).collect()]
    assert victim not in after and after  # dropped, others still served
    batch = ann_batch_topk_indexed(spark, live_dir, [(0, q)], k=5, n_probes=3).collect()
    assert victim not in {r["vec_id"] for r in batch}
    undelete_vectors(live_dir, [victim])
    restored = [(r["vec_id"], r["cosine_sim"])
                for r in ann_topk_indexed(spark, live_dir, q, k=5, n_probes=3).collect()]
    assert restored == want


def test_ann_compaction_folds_deltas_and_tombstones(spark, emb, tmp_path):
    """compact_ann_index: main + delta minus tombstones -> ONE fresh
    sig-partitioned index; probes equal the live group's, the deleted
    vector is PHYSICALLY gone (the fresh index has no tombstones), and a
    completed out_dir refuses reuse."""
    import pytest as _pytest

    from olaf_spark.ops.similarity import (
        ann_topk_indexed,
        append_ann_index,
        build_ann_index,
        compact_ann_index,
        delete_vectors,
    )

    df, base = emb
    live = str(tmp_path / "alive")
    build_ann_index(spark, df.where("vec_id % 2 = 0"), live, n_planes=4, seed=42)
    append_ann_index(spark, df.where("vec_id % 2 = 1"), live)
    q = [float(x) for x in base[0]]
    victim = ann_topk_indexed(spark, live, q, k=5, n_probes=3).collect()[0]["vec_id"]
    delete_vectors(live, [victim])
    want = [(r["vec_id"], r["cosine_sim"])
            for r in ann_topk_indexed(spark, live, q, k=5, n_probes=3).collect()]
    out = str(tmp_path / "acomp")
    compact_ann_index(spark, live, out)
    got = [(r["vec_id"], r["cosine_sim"])
           for r in ann_topk_indexed(spark, out, q, k=5, n_probes=3).collect()]
    assert got == want and all(v != victim for v, _ in got)
    import os

    assert not os.path.exists(os.path.join(out, "tombstones.json"))
    with _pytest.raises(ValueError, match="completed"):
        compact_ann_index(spark, live, out)


def test_ann_batch_matches_per_query_indexed(spark, emb, tmp_path):
    """Batch ANN (one job, broadcast probes) must return exactly what the
    per-query indexed path returns for each query, and prune partitions at
    the scan like it."""
    from olaf_spark.ops.similarity import (
        ann_batch_topk_indexed,
        ann_topk_indexed,
        build_ann_index,
    )

    df, base = emb
    d = str(tmp_path / "annb")
    build_ann_index(spark, df, d, n_planes=4, seed=42)
    queries = [(i, [float(x) for x in base[i]]) for i in range(3)]
    out = ann_batch_topk_indexed(spark, d, queries, k=5, n_probes=3)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = out._jdf.queryExecution().explainString(mode)
    import re

    assert re.search(r"PartitionFilters: \[sig#\d+ IN", p), p
    rows = out.collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine_sim"]))
    for qid, qvec in queries:
        want = [
            (r["vec_id"], r["cosine_sim"])
            for r in ann_topk_indexed(spark, d, qvec, k=5, n_probes=3).collect()
        ]
        assert got.get(qid, []) == want, (qid, got.get(qid), want)


def test_batch_cosine_topk_shape(emb):
    df, _ = emb
    queries = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = batch_cosine_topk(df, queries, k=3).collect()
    assert len(out) == 6
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
    # self-match ranks first with sim 1.0
    top = {r["query_id"]: r for r in out if r["rank"] == 1}
    assert top[0]["vec_id"] == 0 and top[0]["cosine_sim"] == 1.0


def test_multimodal_image_meta(docs):
    media = synth_media(docs)
    rows = image_meta(media).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_bytes"] > 0 and r["format"] in ("png", "jpeg", "webp")
        assert 16 <= r["width"] <= 4096 and 16 <= r["height"] <= 4096
        assert len(r["content_md5"]) == 32
    # determinism: identical payloads -> identical meta
    by_id = {r["media_id"]: (r["format"], r["width"], r["height"], r["content_md5"]) for r in rows}
    assert by_id[0] == by_id[1]


def test_multimodal_golden_bytes_seam(spark):
    """Golden-bytes fixture freezing the stub/real decode seam: swapping in
    a real decoder replaces ONE symbol (_fake_decode_image) and exactly
    these value assertions; all Spark-side plumbing (schema, Arrow batches,
    fan-out) stays. Values derive from md5(payload) — recomputed here
    independently of the module under test."""
    import hashlib

    payload = b"golden fixture payload: 48 bytes of known text!!"
    h = hashlib.md5(payload).hexdigest()
    media = spark.createDataFrame(
        [(7, "image", bytearray(payload), "golden")],
        "media_id long, kind string, payload binary, meta_format string",
    )
    (r,) = image_meta(media).collect()
    assert r["format"] == ["png", "jpeg", "webp"][int(h[0], 16) % 3]
    assert r["width"] == 16 + int(h[1:5], 16) % 4080
    assert r["height"] == 16 + int(h[5:9], 16) % 4080
    assert r["content_md5"] == h and r["n_bytes"] == len(payload)
    frames = frame_sample(media, every_n=1, max_frames=4).collect()
    assert [f["frame_idx"] for f in frames] == [0, 1, 2]  # 48 // 16 = 3
    for f in frames:
        lo = f["frame_idx"] * 16
        assert f["frame_md5"] == hashlib.md5(payload[lo : lo + 64]).hexdigest()


def test_multimodal_pil_backend_stubbed(docs):
    with pytest.raises(NotImplementedError):
        image_meta(synth_media(docs), decode_backend="pil").collect()


def test_multimodal_frame_sample_fanout(docs):
    media = synth_media(docs)
    rows = frame_sample(media, every_n=2, max_frames=4).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0..n-1


# ------------------------------------------------------- connected components


def test_connected_components_basic(spark):
    from olaf_spark.ops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
         (21, 20), (4, 3)],  # duplicate + reversed edges must be harmless
        "doc_a long, doc_b long",
    )
    got = sorted(
        (r["node"], r["component"]) for r in connected_components(pairs).collect()
    )
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    ]


def test_connected_components_empty_and_absent_nodes(spark):
    from olaf_spark.ops.dedup import connected_components

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0
    # nodes appearing in no pair are ABSENT (callers coalesce to self)
    pairs = spark.createDataFrame([(5, 6)], "doc_a long, doc_b long")
    assert {r["node"] for r in connected_components(pairs).collect()} == {5, 6}


def test_connected_components_long_chain_logarithmic_rounds(spark):
    """A diameter-60 chain must converge well inside the O(log^2 n) bound —
    label propagation would need ~60 rounds; large-star/small-star a
    handful. max_rounds=10 is the regression tripwire."""
    from olaf_spark.ops.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 160)], "doc_a long, doc_b long"
    )
    out = connected_components(chain, max_rounds=10).collect()
    assert len(out) == 61
    assert all(r["component"] == 100 for r in out)


# ----------------------------------------------------------------- IVF ANN


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """4 well-separated direction blobs (the corpus shape IVF exists for),
    deterministic."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 5.0
    pts = []
    for i in range(120):
        c = centers[i % 4]
        pts.append(c + 0.15 * rng.standard_normal(16))
    rows = [(i, [float(x) for x in pts[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    return df, np.array(pts)


def test_ivf_exact_at_full_probe(spark, clustered_emb, tmp_path):
    """nprobe = n_centroids probes every cell -> the answer must EQUAL
    brute-force cosine top-k (the oracle-checked configuration)."""
    from olaf_spark.ops.similarity import ann_ivf_topk, build_ivf_index

    df, pts = clustered_emb
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, df, d, n_centroids=4, sample_size=1000, seed=42)
    q = [float(x) for x in pts[0]]
    got = [(r["vec_id"], r["cosine_sim"])
           for r in ann_ivf_topk(spark, d, q, k=8, nprobe=4).collect()]
    want = [(r["vec_id"], r["cosine_sim"]) for r in cosine_topk(df, q, k=8).collect()]
    assert got == want


def test_ivf_recall_and_partition_pruning(spark, clustered_emb, tmp_path):
    """nprobe=1 on blob data: the scan must read ONE hive partition
    (PartitionFilters on cluster) and still recover the blob's top-k."""
    from olaf_spark.ops.similarity import ann_ivf_topk, build_ivf_index

    df, pts = clustered_emb
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, df, d, n_centroids=4, sample_size=1000, seed=42)
    q = [float(x) for x in pts[0]]
    probe = ann_ivf_topk(spark, d, q, k=8, nprobe=1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=8).collect()}
    got = {r["vec_id"] for r in probe.collect()}
    # all of blob 0's top-k lives in one cell on well-separated blobs
    assert len(got & exact) >= 7, (got, exact)


def test_ivf_batch_matches_single(spark, clustered_emb, tmp_path):
    """The one-job batch path must reproduce the per-query path exactly at
    the same nprobe (same cells probed, same verify arithmetic)."""
    from olaf_spark.ops.similarity import (
        ann_ivf_batch_topk,
        ann_ivf_topk,
        build_ivf_index,
    )

    df, pts = clustered_emb
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, df, d, n_centroids=4, sample_size=1000, seed=42)
    queries = [(i, [float(x) for x in pts[i]]) for i in range(3)]
    batch = ann_ivf_batch_topk(spark, d, queries, k=5, nprobe=2)
    rows = batch.orderBy("query_id", "rank").collect()
    for qid, qv in queries:
        single = [(r["vec_id"], r["cosine_sim"])
                  for r in ann_ivf_topk(spark, d, qv, k=5, nprobe=2).collect()]
        got = [(r["vec_id"], r["cosine_sim"])
               for r in rows if r["query_id"] == qid]
        assert got == single, qid


def test_ivf_deterministic_rebuild_and_refusal(spark, clustered_emb, tmp_path):
    """Rebuilds are byte-identical (seeded sample + fixed-iteration
    k-means); probing an uncommitted dir refuses loudly; the commit marker
    is retracted before a rebuild overwrites rows."""
    from olaf_spark.ops.similarity import _ivf_meta, ann_ivf_topk, build_ivf_index

    df, pts = clustered_emb
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_ivf_index(spark, df, d1, n_centroids=4, sample_size=1000, seed=42)
    build_ivf_index(spark, df, d2, n_centroids=4, sample_size=1000, seed=42)
    assert _ivf_meta(d1)["centroids"] == _ivf_meta(d2)["centroids"]
    with pytest.raises(ValueError, match="no committed IVF index"):
        ann_ivf_topk(spark, str(tmp_path / "nowhere"), [0.0] * 16, k=5)


def test_ivf_lifecycle_live_group_equals_rebuild(spark, clustered_emb, tmp_path):
    """Append + tombstone + compact over the IVF layout: the live group
    (base + committed deltas - tombstones) must answer identically to a
    fresh index over the same live set with the same centroids — cell
    assignment is frozen-centroid-deterministic, so no re-training drift.
    delete_vectors/ann_tombstones are the SAME functions the LSH layout
    uses (they only touch tombstones.json)."""
    from olaf_spark.ops.similarity import (
        ann_ivf_topk,
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        delete_vectors,
    )

    df, pts = clustered_emb
    d = str(tmp_path / "live")
    base = df.where(F.col("vec_id") < 80)
    extra = df.where(F.col("vec_id") >= 80)
    build_ivf_index(spark, base, d, n_centroids=4, sample_size=1000, seed=42)
    append_ivf_index(spark, extra, d)
    delete_vectors(d, [0, 81])
    q = [float(x) for x in pts[2]]
    got = [(r["vec_id"], r["cosine_sim"])
           for r in ann_ivf_topk(spark, d, q, k=8, nprobe=4).collect()]
    # referent: brute force over the live set
    live = df.where(~F.col("vec_id").isin([0, 81]))
    want = [(r["vec_id"], r["cosine_sim"]) for r in cosine_topk(live, q, k=8).collect()]
    assert got == want
    assert 0 not in {v for v, _ in got} and 81 not in {v for v, _ in got}
    # compaction folds deltas + tombstones; answers unchanged
    c = str(tmp_path / "compacted")
    compact_ivf_index(spark, d, c)
    got_c = [(r["vec_id"], r["cosine_sim"])
             for r in ann_ivf_topk(spark, c, q, k=8, nprobe=4).collect()]
    assert got_c == got
    # refusals: empty append, compact onto a committed dir
    with pytest.raises(ValueError, match="empty vector batch"):
        append_ivf_index(spark, df.where(F.col("vec_id") < 0), d)
    with pytest.raises(ValueError, match="already holds a completed vector index"):
        compact_ivf_index(spark, d, c)


def test_rebuild_voids_deltas_tombstones_and_scan_cache(spark, clustered_emb, tmp_path):
    """RE-building over a dir that accumulated deltas + tombstones must
    void them (delta cell/sig assignments were made with the OLD
    centroids/planes — served against a retrained base they silently
    lose recall and can duplicate vectors), and the plan-level scan
    cache must serve the NEW layout within the same session (inode+
    mtime_ns key). Probes before AND after the rebuild pin both."""
    from olaf_spark.ops.similarity import (
        _ann_delta_dirs,
        _ivf_delta_dirs,
        ann_ivf_topk,
        ann_tombstones,
        ann_topk_indexed,
        append_ann_index,
        append_ivf_index,
        build_ann_index,
        build_ivf_index,
        delete_vectors,
    )

    df, pts = clustered_emb
    q = [float(x) for x in pts[2]]
    base = df.where(F.col("vec_id") < 80)

    d = str(tmp_path / "ivf")
    build_ivf_index(spark, base, d, n_centroids=4, sample_size=1000, seed=42)
    ann_ivf_topk(spark, d, q, k=8, nprobe=4).collect()  # populate scan cache
    append_ivf_index(spark, df.where(F.col("vec_id") >= 80), d)
    delete_vectors(d, [2])
    assert len(_ivf_delta_dirs(d)) == 1 and ann_tombstones(d) == {2}
    # retrain over the FULL corpus into the same dir
    build_ivf_index(spark, df, d, n_centroids=4, sample_size=1000, seed=43)
    assert _ivf_delta_dirs(d) == [] and ann_tombstones(d) == set()
    got = [(r["vec_id"], r["cosine_sim"])
           for r in ann_ivf_topk(spark, d, q, k=8, nprobe=4).collect()]
    want = [(r["vec_id"], r["cosine_sim"]) for r in cosine_topk(df, q, k=8).collect()]
    assert got == want  # no duplicates from stale deltas, vec 2 is back

    a = str(tmp_path / "lsh")
    build_ann_index(spark, base, a, n_planes=4, seed=42)
    ann_topk_indexed(spark, a, q, k=8, n_probes=16).collect()  # cache
    append_ann_index(spark, df.where(F.col("vec_id") >= 80), a)
    delete_vectors(a, [2])
    build_ann_index(spark, df, a, n_planes=4, seed=42)
    assert _ann_delta_dirs(a) == [] and ann_tombstones(a) == set()
    got = [(r["vec_id"], r["cosine_sim"])
           for r in ann_topk_indexed(spark, a, q, k=8, n_probes=16).collect()]
    assert got == want  # 16 probes of 4 planes = all buckets = exact


def test_stream_vector_appends_live_and_replay_idempotent(spark, clustered_emb, tmp_path):
    """Structured Streaming vector ingestion: micro-batches append deltas
    via foreachBatch (streaming.stream_vector_appends); probes over the
    live group then equal brute force over everything ingested, and an
    at-least-once epoch REPLAY (same delta name) is a no-op, not a
    duplicate."""
    from olaf_spark.ops.similarity import (
        _ivf_delta_dirs,
        ann_ivf_topk,
        append_ivf_index,
        build_ivf_index,
    )
    from olaf_spark.streaming import stream_vector_appends

    df, pts = clustered_emb
    d = str(tmp_path / "ivf_stream")
    build_ivf_index(
        spark, df.where(F.col("vec_id") < 60), d, n_centroids=4,
        sample_size=1000, seed=42,
    )
    src = str(tmp_path / "incoming")
    df.where("vec_id >= 60 and vec_id % 2 = 0").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    df.where("vec_id >= 60 and vec_id % 2 = 1").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(stream_vector_appends(spark, d, layout="ivf"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(_ivf_delta_dirs(d)) == 2  # one committed delta per micro-batch
    qv = [float(x) for x in pts[1]]
    got = [(r["vec_id"], r["cosine_sim"])
           for r in ann_ivf_topk(spark, d, qv, k=8, nprobe=4).collect()]
    want = [(r["vec_id"], r["cosine_sim"]) for r in cosine_topk(df, qv, k=8).collect()]
    assert got == want
    # replayed epoch: same delta name, same vectors -> no second delta
    epoch0 = _ivf_delta_dirs(d)[0].rsplit("/", 1)[1]
    append_ivf_index(spark, df.where("vec_id >= 60 and vec_id % 2 = 0"), d,
                     delta_name=epoch0)
    assert len(_ivf_delta_dirs(d)) == 2
    assert [(r["vec_id"], r["cosine_sim"])
            for r in ann_ivf_topk(spark, d, qv, k=8, nprobe=4).collect()] == want
