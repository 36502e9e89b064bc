"""Document-at-a-time BM25 top-k with block-max WAND pruning.

Reference analogue: Olaf's query loop (`olaf_fp_matcher.c`) is a
threshold-driven accumulator over sorted posting ranges: `minMatchCount`
is a score threshold that prunes low-evidence candidates, `maxResults`
a bounded top-k heap (:275-341), and the sorted B+tree key layout is what
makes range skipping possible (`olaf_fp_extractor.c:66-91`). Block-max
WAND (Broder et al. 2003; Ding & Suel 2011 — public literature) is the
principled version of that: per-block score upper bounds let the cursor
skip whole blocks that cannot beat the current k-th best score.

This scorer runs DRIVER-SIDE (or inside a single task for batch query
sets) over the packed posting rows of the handful of query terms — the
p50-latency serving path. The distributed DataFrame path (scorer.py)
remains the bulk/batch path. Both are rank-identical to the oracle.

Determinism: a fully-evaluated doc sums its term contributions in
ascending term order, float64 — the oracle's exact accumulation order.
Top-k ordering: (score desc, doc_id asc), enforced via a heap keyed
(score, -doc_id).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from olaf_spark.codec import unpack_postings, varbyte_decode
from olaf_spark.config import EngineConfig
from olaf_spark.indexer import Index
from olaf_spark.scorer import idf as idf_fn
from olaf_spark.tokenize import tokenize_py


@dataclass
class TermPostings:
    term: str
    idf: float
    doc_ids: np.ndarray     # int64 ascending
    scores: np.ndarray      # float64 full BM25 contribution per posting
    block_lasts: np.ndarray  # int64 last doc_id per block
    block_maxes: np.ndarray  # float64 max contribution per block
    max_score: float


def _fetch_posting_rows(index: Index, qterms: list[str]) -> list[dict]:
    """Read the ~|q| posting rows straight from parquet via pyarrow.

    The serving path does NOT launch a Spark job: like Olaf's query opening
    LMDB read-only (olaf_runner.c:34-39), it reads the index storage
    directly. Postings are range-partitioned + sorted by term, so the isin
    filter prunes via parquet row-group statistics. On a cluster this runs
    wherever the server process lives; the Spark DataFrame path (scorer.py /
    Index.postings) remains for batch jobs.
    """
    import pyarrow.compute as pc

    from olaf_spark.indexer import term_id_py

    dataset = index.dataset()
    qids = sorted({term_id_py(t) for t in qterms})
    tbs = sorted({i % index.cfg.n_segments for i in qids})
    # hive partition pruning on tb -> reads ~|q| shard directories; row-group
    # stats on the term_id-sorted shards prune further within each file
    tbl = dataset.to_table(
        filter=pc.field("tb").isin(tbs) & pc.field("term_id").isin(qids)
    )
    return tbl.to_pylist()


def load_term_postings(
    spark: SparkSession | None, index: Index, query_text: str
) -> list[TermPostings]:
    """Fetch + decode posting rows for the query's distinct terms.

    `spark` is accepted for API symmetry but unused — see _fetch_posting_rows.
    """
    from olaf_spark.indexer import term_id_py

    cfg = index.cfg
    qterms = sorted(set(tokenize_py(query_text, cfg)))
    if not qterms:
        return []
    # id -> term STRING so accumulation order stays ascending-by-term-string
    # (the oracle's order — bit-identical float sums); on an id collision the
    # lexicographically first string labels the merged postings
    id_to_term: dict[int, str] = {}
    for t in qterms:
        id_to_term.setdefault(term_id_py(t), t)
    rows = _fetch_posting_rows(index, qterms)
    tombstones = index.tombstones()
    out = []
    # chunked head terms arrive as several rows (chunk 0..n, doc-disjoint);
    # one TermPostings per row is fine for every scorer — a doc lives in
    # exactly one chunk, so per-doc accumulation order is still term order
    for r in sorted(rows, key=lambda r: (id_to_term[r["term_id"]], r["chunk"])):
        ids, tfs = unpack_postings(bytes(r["doc_ids_bin"]), bytes(r["tfs_bin"]))
        dls = varbyte_decode(bytes(r["doc_lens_bin"]))
        if tombstones:
            # merge-on-read delete; block metadata stays valid: removing docs
            # can only lower a block's true max, so stored maxes remain upper
            # bounds and block_lasts remain sound skip targets.
            keep = ~np.isin(ids.astype(np.int64), np.fromiter(tombstones, dtype=np.int64))
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        w = idf_fn(index.n_docs, int(r["df"]))
        tfs_f = tfs.astype(np.float64)
        dls_f = dls.astype(np.float64)
        # association order matches the oracle exactly: idf * (tf*(k1+1)/denom)
        scores = w * (
            tfs_f * (cfg.k1 + 1.0)
            / (tfs_f + cfg.k1 * (1.0 - cfg.b + cfg.b * dls_f / index.avgdl))
        )
        bl = np.asarray(r["block_lasts"], dtype=np.int64)
        bm = np.asarray(r["block_maxes"], dtype=np.float64)
        out.append(
            TermPostings(
                term=id_to_term[r["term_id"]], idf=w,
                doc_ids=ids.astype(np.int64), scores=scores,
                block_lasts=bl, block_maxes=bm,
                max_score=float(bm.max()) if bm.size else 0.0,
            )
        )
    return out


def vectorized_topk(lists: list[TermPostings], k: int) -> list[tuple[int, float]]:
    """Exact BM25 top-k, fully vectorized — the default serving scorer.

    With postings decoded to contiguous numpy arrays, a vectorized
    accumulate beats a Python document-at-a-time loop by ~100x at any list
    length that fits in memory; block-max WAND (wand_topk) remains the
    scale path for lazily-decoded block storage, and the two are
    rank-identical (tests/test_index_wand.py).

    Determinism: `lists` arrives sorted by term (load_term_postings), so
    concatenation order == ascending term order; the STABLE sort keeps
    equal doc_ids in that order, and np.add.reduceat folds each doc's
    segment in that order. reduceat uses numpy's pairwise summation, so
    sums sit within 1 ulp of the oracle's strict sequential fold (the 4dp
    rounding of every oracle comparison absorbs this); results are still
    run-to-run deterministic for a fixed segment.

    Cost shape: each posting list is already doc_id-sorted, so the stable
    argsort is a timsort run-merge (near-linear), and top-k selection is
    an argpartition + small exact re-sort instead of a full lexsort over
    every matched doc (a head-term query matches most of the corpus).
    """
    if not lists or k <= 0:
        return []
    ids = np.concatenate([tp.doc_ids for tp in lists])
    if ids.size == 0:  # e.g. every posting tombstoned
        return []
    scores = np.concatenate([tp.scores for tp in lists])
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    sc_s = scores[order]
    d_new = np.empty(ids_s.size, dtype=bool)
    d_new[0] = True
    d_new[1:] = ids_s[1:] != ids_s[:-1]
    starts = np.flatnonzero(d_new)
    uniq = ids_s[starts]
    acc = np.add.reduceat(sc_s, starts)

    n = uniq.size
    if n > k:
        # exact top-k with (score desc, doc_id asc) ties: partition for the
        # k-th score, keep everything >= it, re-sort only that sliver
        kth = np.partition(acc, n - k)[n - k]
        sel = np.flatnonzero(acc >= kth)
        sub = np.lexsort((uniq[sel], -acc[sel]))[:k]
        top = sel[sub]
    else:
        top = np.lexsort((uniq, -acc))[:k]
    return [(int(uniq[i]), float(acc[i])) for i in top]


def exhaustive_topk(lists: list[TermPostings], k: int) -> list[tuple[int, float]]:
    """Term-at-a-time exhaustive scoring — the referent for WAND tests.

    Accumulates per-term passes in ascending term order so each doc's float
    additions happen in oracle order.
    """
    acc: dict[int, float] = {}
    for tp in lists:  # lists arrive sorted by term
        for d, s in zip(tp.doc_ids.tolist(), tp.scores.tolist()):
            acc[d] = acc.get(d, 0.0) + s
    ranked = sorted(acc.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def wand_topk(lists: list[TermPostings], k: int) -> list[tuple[int, float]]:
    """Block-max WAND: exact top-k, skipping blocks that can't beat theta."""
    if not lists or k <= 0:
        return []
    n = len(lists)
    cur = [0] * n                        # cursor per list
    sizes = [tp.doc_ids.size for tp in lists]
    heap: list[tuple[float, int]] = []   # (score, -doc_id) min-heap of k best
    theta = -np.inf

    def cur_doc(i: int) -> int:
        return int(lists[i].doc_ids[cur[i]]) if cur[i] < sizes[i] else 2**62

    while True:
        order = sorted((i for i in range(n) if cur[i] < sizes[i]), key=cur_doc)
        if not order:
            break
        # pivot: first list where cumulative (global) upper bound >= theta
        ub = 0.0
        pivot = -1
        for pos, i in enumerate(order):
            ub += lists[i].max_score
            if ub > theta or (len(heap) < k):
                pivot = pos
                break
        if pivot < 0:
            break  # even all max scores together can't beat theta
        pivot_doc = cur_doc(order[pivot])

        # block-max refinement over P = ALL lists whose cursor is at or before
        # pivot_doc (lists past the pivot position may still sit exactly on
        # pivot_doc — they must count toward the bound or it isn't one).
        P = [i for i in order if cur_doc(i) <= pivot_doc]
        others = [cur_doc(i) for i in order if cur_doc(i) > pivot_doc]
        next_doc = min(others) if others else 2**62
        bub = 0.0
        boundary = 2**62
        for i in P:
            tp = lists[i]
            bi = int(np.searchsorted(tp.block_lasts, pivot_doc))
            if bi < tp.block_maxes.size:
                bub += float(tp.block_maxes[bi])
                boundary = min(boundary, int(tp.block_lasts[bi]))
        if len(heap) >= k and bub <= theta:
            # no doc d in [pivot_doc, min(boundary, next_doc-1)] can beat
            # theta: every list outside P starts at next_doc, and inside P the
            # same block (max <= block_max) covers d up to its boundary.
            target = max(pivot_doc + 1, min(boundary + 1, next_doc))
            for i in P:
                cur[i] = int(np.searchsorted(lists[i].doc_ids, target))
            continue

        if cur_doc(order[0]) == pivot_doc:
            # fully evaluate pivot_doc: sum in ascending TERM order (lists
            # are term-sorted by construction, order[] is doc-sorted)
            score = 0.0
            for i in range(n):
                if cur[i] < sizes[i] and int(lists[i].doc_ids[cur[i]]) == pivot_doc:
                    score += float(lists[i].scores[cur[i]])
                    cur[i] += 1
            key = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, key)
                if len(heap) == k:
                    theta = heap[0][0]
            elif key > heap[0]:
                heapq.heapreplace(heap, key)
                theta = heap[0][0]
        else:
            # advance lists before the pivot up to pivot_doc (galloping)
            for i in order[:pivot]:
                tp = lists[i]
                cur[i] = int(np.searchsorted(tp.doc_ids, pivot_doc))
    ranked = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return [(-d, s) for s, d in ranked]


def query_index(
    spark: SparkSession,
    index: Index,
    query_text: str,
    k: int | None = 10,
    method: str = "vectorized",
    min_score: float | None = None,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) from a materialized index.

    method: "vectorized" (default serving path), "wand" (block-max DAAT,
    the lazy-decode scale path), or "exhaustive" (test referent).

    k=None uses cfg.max_results (Olaf maxResults=50, olaf_config.c:99-100);
    min_score=None uses cfg.min_score (minMatchCount analogue,
    olaf_config.c:89-94) — scores below the threshold never surface.
    """
    if k is None:
        k = index.cfg.max_results
    if min_score is None:
        min_score = index.cfg.min_score
    lists = load_term_postings(spark, index, query_text)
    if not lists:
        return []
    fn = {"vectorized": vectorized_topk, "wand": wand_topk, "exhaustive": exhaustive_topk}[method]
    hits = fn(lists, k)
    if min_score > 0.0:
        hits = [(d, s) for d, s in hits if s >= min_score]
    return hits
