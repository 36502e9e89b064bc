"""Distributed batch BM25: score a whole query batch against the
materialized index in ONE Spark job.

Reference analogue: Olaf's bulk-query protocol — the benchmark harness
queries 35+15 files per corpus doubling through one long-lived process
(`eval/olaf_benchmark/olaf_benchmark.rb:76-81`), and the CLI accepts many
query files in one invocation (`olaf.c` query loop). The driver-side
serving scorer (wand.py) answers ONE query at ~ms latency; this module is
the throughput path: B queries as one DataFrame plan over the packed
posting rows, executed by the cluster.

Shape (100 TB / 1000 executors):

  driver    tokenize B queries (tiny), term_id each term, broadcast
            {term_id -> [(query_id, term)]} + (N, avgdl, k1, b, tombstones)
  scan      postings parquet pruned by hive partition (tb) AND row-group
            stats (term_id isin) -> ~|distinct terms| rows read, not the
            corpus; NO join — the query side rides the broadcast
  decode    mapInPandas: one Python invocation per Arrow batch of posting
            rows; numpy varbyte decode once per row, contributions computed
            once per (term, doc) and fanned out to every subscribed query
  aggregate groupBy(query_id, doc_id) with the deterministic ascending-term
            float64 fold (same order as the oracle and the serving scorer)
  top-k     rank<=k window per query_id: Spark plans a WindowGroupLimit,
            i.e. a map-side partial top-k per partition BEFORE the shuffle,
            so the exchange carries <= k rows per (partition, query), never
            a head-term query's full match set

Rank- and score-identical to wand.query_index / the DuckDB oracle per
query (tests/test_batch.py, CORRECTNESS `bm25_batch_distributed`).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olaf_spark.codec import decode_ids_blocked, varbyte_decode
from olaf_spark.indexer import Index, term_id_py, tombstone_keep_mask
from olaf_spark.scorer import idf as idf_fn
from olaf_spark.tokenize import tokenize_py

PARTIAL_SCHEMA = "query_id long, doc_id long, term_ord int, contrib double"


def _subs_for(queries: Iterable[tuple[int, str]], cfg) -> dict[int, list[tuple[int, int]]]:
    """term_id -> [(query_id, term_ord)] subscription map for a query batch
    — shared by the single-index and group batch paths.

    term_ord is the term's rank in the ASCENDING-STRING order of the
    batch's distinct terms: folding partials by ordinal reproduces the
    oracle's ascending-term accumulation order exactly, while the shuffle
    carries a fixed-width int32 per row instead of the term STRING (which
    round 3 shipped per (query, doc, term) row purely for sort order —
    object-dtype strings in every Arrow batch and exchange)."""
    per_query: dict[int, list[str]] = {}
    vocab: set[str] = set()
    for qid, text in queries:
        if int(qid) in per_query:
            # refuse rather than silently overwrite (or double-count — the
            # round-3 append semantics emitted duplicate partials for terms
            # shared by the two texts): query_id is the result key
            raise ValueError(f"duplicate query_id {int(qid)} in batch")
        terms = sorted(set(tokenize_py(text, cfg)))
        per_query[int(qid)] = terms
        vocab.update(terms)
    ord_of = {t: i for i, t in enumerate(sorted(vocab))}
    subs: dict[int, list[tuple[int, int]]] = {}
    for qid, terms in per_query.items():
        for term in terms:
            subs.setdefault(term_id_py(term), []).append((qid, ord_of[term]))
    return subs


def _make_score_partials(
    bsubs,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
):
    """mapInPandas fn: posting rows -> (query_id, doc_id, term_ord, contrib).

    Decode + BM25 contribution happen ONCE per posting row; queries sharing
    a term reuse the same contribution arrays (BM25 term contributions do
    not depend on the query, only on (term, doc) stats).

    bsubs is a SparkContext BROADCAST of (subs, tombstone int64 array |
    None, idf_map | None) — captured by handle, not by value: closure
    capture re-pickles the whole subscription map into every task launch
    (MBs per task at B=100k queries x many terms), while a broadcast ships
    it once per executor and tasks dereference it. idf_map {term_id: w}
    overrides the per-row df-derived idf — the GROUP path passes group-
    global weights there (a part row's df column is part-local).
    """

    def score(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        subs, ts_arr, idf_map = bsubs.value
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            out_qid, out_doc, out_ord, out_contrib = [], [], [], []
            terms_np = pdf["term_id"].to_numpy(dtype=np.int64)
            dfs_np = pdf["df"].to_numpy(dtype=np.int64)
            id_bufs = pdf["doc_ids_bin"].to_numpy()
            tf_bufs = pdf["tfs_bin"].to_numpy()
            dl_bufs = pdf["doc_lens_bin"].to_numpy()
            for i in range(len(pdf)):
                subscribers = subs.get(int(terms_np[i]))
                if not subscribers:
                    continue  # row-group stats pruning is approximate
                ids = decode_ids_blocked(bytes(id_bufs[i]), block_size).astype(np.int64)
                tfs = varbyte_decode(bytes(tf_bufs[i]))
                dls = varbyte_decode(bytes(dl_bufs[i]))
                if ts_arr is not None:
                    keep = tombstone_keep_mask(ids, ts_arr)
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                if ids.size == 0:
                    continue
                tid = int(terms_np[i])
                w = idf_map[tid] if idf_map is not None else idf_fn(n_docs, int(dfs_np[i]))
                tfs_f = tfs.astype(np.float64)
                dls_f = dls.astype(np.float64)
                # association order matches oracle: idf * (tf*(k1+1)/denom)
                contrib = w * (
                    tfs_f * (k1 + 1.0)
                    / (tfs_f + k1 * (1.0 - b + b * dls_f / avgdl))
                )
                for qid, term_ord in subscribers:
                    out_qid.append(np.full(ids.size, qid, dtype=np.int64))
                    out_doc.append(ids)
                    out_ord.append(np.full(ids.size, term_ord, dtype=np.int32))
                    out_contrib.append(contrib)
            if out_qid:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_qid),
                        "doc_id": np.concatenate(out_doc),
                        "term_ord": np.concatenate(out_ord),
                        "contrib": np.concatenate(out_contrib),
                    }
                )

    return score


def batch_query_index(
    spark: SparkSession,
    index: Index,
    queries: Iterable[tuple[int, str]],
    k: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — BM25 top-k for EVERY query in the
    batch, as one distributed plan over the materialized index.

    queries: (query_id, query_text) pairs. k/min_score default to the
    index config's max_results / min_score (olaf_config.c:89-100).
    """
    cfg = index.cfg
    if k is None:
        k = cfg.max_results
    if min_score is None:
        min_score = cfg.min_score

    # ---- driver side: tokenize the batch, build the term subscription map --
    subs = _subs_for(queries, cfg)
    if not subs:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double, rank long"
        )
    qids_terms = sorted(subs)
    tbs = sorted({t % cfg.n_segments for t in qids_terms})

    # ---- one scan: hive pruning on tb, row-group pruning on term_id --------
    postings = index.postings(spark).where(
        F.col("tb").isin(tbs) & F.col("term_id").isin(qids_terms)
    )
    ts_arr = index.tombstones_arr()  # cached sorted array rides the broadcast
    bsubs = spark.sparkContext.broadcast((subs, ts_arr, None))
    partials = postings.mapInPandas(
        _make_score_partials(
            bsubs, index.n_docs, index.avgdl, cfg.k1, cfg.b, cfg.block_size,
        ),
        PARTIAL_SCHEMA,
    )

    return _fold_and_topk(partials, k, min_score)


def _fold_and_topk(partials: DataFrame, k: int, min_score: float) -> DataFrame:
    """Deterministic ascending-term float64 fold + per-query bounded top-k
    (rank<=k plans as WindowGroupLimit: map-side partial top-k per
    partition BEFORE the shuffle). Sorting by term_ord IS ascending-term
    order — the ordinal is defined by it (_subs_for)."""
    scored = partials.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term_ord", "contrib"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    if min_score > 0.0:
        scored = scored.where(F.col("score") >= F.lit(float(min_score)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank")
        )
    )


def batch_query_index_group(
    spark: SparkSession,
    group,
    queries: Iterable[tuple[int, str]],
    k: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """Distributed batch BM25 over an IndexGroup (main + live deltas) — the
    bulk path stays available BETWEEN appends and compaction, exactly like
    driver-side group serving (incremental.IndexGroup.topk).

    Same one-job shape as batch_query_index, with two group twists:
      * the scan is the UNION of every part's pruned posting scan (each
        part prunes by hive tb + term_id row-group stats independently);
      * idf must be GROUP-global while a part row's df column is
        part-local, so per-term group weights are resolved DRIVER-side
        (one tiny pyarrow read of ~|terms| row headers per part — the same
        reads group serving does) and ride the broadcast as {term_id: w}.
    A doc lives in exactly one part, so the fold still sums each (query,
    doc) once per term — rank/score-identical to group serving and to a
    clean rebuild (tests/test_batch.py).
    """

    cfg = group.cfg
    if k is None:
        k = cfg.max_results
    if min_score is None:
        min_score = cfg.min_score

    subs = _subs_for(queries, cfg)
    if not subs:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double, rank long"
        )
    qids_terms = sorted(subs)
    tbs = sorted({t % cfg.n_segments for t in qids_terms})

    # group-global df from the single shared source (concurrent header-only
    # reads) — a part row's df column is part-local, so idf resolves
    # driver-side and rides the broadcast
    idf_map = {
        tid: idf_fn(group.n_docs, df)
        for tid, df in group.term_dfs(qids_terms).items()
    }

    ts_arr = group.tombstones_arr()  # sorted union across parts
    bsubs = spark.sparkContext.broadcast((subs, ts_arr, idf_map))

    scan = None
    for p in group.parts:
        part_scan = p.postings(spark).where(
            F.col("tb").isin(tbs) & F.col("term_id").isin(qids_terms)
        )
        scan = part_scan if scan is None else scan.unionByName(part_scan)
    partials = scan.mapInPandas(
        _make_score_partials(
            bsubs, group.n_docs, group.avgdl, cfg.k1, cfg.b, cfg.block_size,
        ),
        PARTIAL_SCHEMA,
    )
    return _fold_and_topk(partials, k, min_score)
