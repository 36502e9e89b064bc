"""Positional side index + exact phrase (adjacency) queries.

Reference analogue: Olaf stores each fingerprint's TIME inside the packed
posting value (`olaf_fp_db_writer.c` packs t1 into the 64-bit key) and the
matcher verifies TIME-COHERENCE — matches must align in time, not just
co-occur (`olaf_fp_matcher.c:148-186`, the time-diff tally that
`match_tally` re-expresses). Token positions are the text twin of those
timestamps, and an exact-phrase query is the text twin of a time-aligned
fingerprint sequence: term i must occur at position p+i of the SAME doc.

Spark-first shape:

  build_positions   one wide shuffle (same doc-id-range bucketing as the
                    main build) -> mapInPandas pack: per (term, bucket) row
                    holds doc_ids (delta+varbyte), per-doc position counts
                    (varbyte), and per-doc delta-encoded positions (one
                    buffer, restart at each doc boundary — encode_grouped's
                    delta_starts) -> parquet hive-partitioned by tb.
                    A SIDE index: the main postings format is untouched
                    (phrase support is additive, like Olaf keeping metadata
                    in a separate LMDB database, olaf_db.c:64-71).

  phrase_topk       driver-side serving read (pyarrow, tb pruning +
                    term_id row-group stats — the same access shape as
                    wand._fetch_posting_rows): decode each phrase term's
                    (doc, positions), then verify adjacency fully
                    vectorized — term i's (doc, pos - i) keys intersect
                    across terms; surviving keys ARE the phrase
                    occurrences. phrase_tf per doc ranks the result.

Scale notes: rows are (term, bucket)-chunked like stage-1 segments, so a
head term's positions never form one mega-row; a phrase query reads only
its terms' rows; positions add ~1 varbyte per occurrence next to the main
index's ~1.2 bytes/posting. Candidate verification is per-query numpy over
the decoded lists — the same latency class as the BM25 serving scorer.

Known limit (deliberate): the positional index is rebuilt per corpus
snapshot, not delta-appended — rows are doc-disjoint, so appending would
be the same delta-directory move as incremental.py, but phrase serving
over a group is not wired yet; rebuild positions after compaction (the
build is one shuffle over token occurrences, cheaper than the main index
build's pack+merge).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olaf_spark.codec import delta_decode, encode_grouped, varbyte_decode
from olaf_spark.config import EngineConfig
from olaf_spark.indexer import (
    _iter_term_chunks,
    bucket_expr,
    bucket_of_np,
    shard_from_id_col,
    term_id_col,
    term_id_py,
)
from olaf_spark.tokenize import tokenize_py, tokens_df

POSITIONS_SCHEMA = (
    "term_id long, n_docs long, "
    "doc_ids_bin binary, pos_counts_bin binary, pos_bin binary"
)

_DEFAULT = EngineConfig()


def _seg_cumsum(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Segmented cumsum: each segment's first value is absolute, the rest
    are gaps (the decode twin of encode_grouped's delta_starts restarts)."""
    if vals.size == 0:
        return vals
    cts = np.asarray(counts, dtype=np.int64)
    c = np.cumsum(vals, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(cts)[:-1]]).astype(np.int64)
    cpad = np.concatenate([np.zeros(1, dtype=np.uint64), c])
    base = cpad[starts]
    return c - np.repeat(base, cts)


def _make_pack_positions(lo: int, width: int, n_buckets: int):
    """Sorted (term_id, doc_id, pos) occurrence rows -> packed position rows
    per (term, bucket) group — same single-pass numpy group detection as
    the main build's _pack_stage1."""
    import pandas as pd

    def _pack_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        terms = pdf["term_id"].to_numpy(dtype=np.int64)
        docs_ = pdf["doc_id"].to_numpy(dtype=np.int64)
        pos = pdf["pos"].to_numpy(dtype=np.uint64)
        buckets = bucket_of_np(docs_, lo, width, n_buckets)

        g_new = np.empty(n, dtype=bool)
        g_new[0] = True
        g_new[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
        d_new = g_new.copy()
        d_new[1:] |= docs_[1:] != docs_[:-1]

        doc_starts = np.flatnonzero(d_new)               # occurrence space
        counts = np.diff(np.append(doc_starts, n)).astype(np.uint64)
        doc_ids = docs_[doc_starts].astype(np.uint64)

        g_rows = np.flatnonzero(g_new)                   # occurrence space
        g_docs = np.searchsorted(doc_starts, g_rows)     # doc space
        n_docs = np.diff(np.append(g_docs, doc_starts.size))

        return pd.DataFrame(
            {
                "term_id": terms[g_rows],
                "n_docs": n_docs.astype("int64"),
                "doc_ids_bin": encode_grouped(doc_ids, g_docs, delta=True),
                "pos_counts_bin": encode_grouped(counts, g_docs, delta=False),
                # positions: ONE buffer per group, gap-encoded with an
                # ABSOLUTE restart at every doc boundary (delta_starts)
                "pos_bin": encode_grouped(
                    pos, g_rows, delta=True, delta_starts=doc_starts
                ),
            }
        )

    def _pack(pdf_iter):
        for pdf in _iter_term_chunks(pdf_iter):
            yield _pack_chunk(pdf)

    return _pack


def build_positions(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: EngineConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> str:
    """Materialize the positional side index under <out_dir>/positions."""
    import json

    cfg = cfg or EngineConfig()
    bounds = docs.agg(
        F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
    ).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // n_buckets + 1)

    toks = tokens_df(docs, text_col, id_col, cfg, with_pos=True)
    occ = toks.select(
        "doc_id", F.col("pos").cast("long").alias("pos"),
        term_id_col(F.col("term")).alias("term_id"),
    )
    b_expr = bucket_expr(F.col("doc_id"), lo, width, n_buckets)
    n_tasks = max(n_buckets, spark.sparkContext.defaultParallelism)
    packed = (
        occ.repartition(n_tasks, b_expr, F.col("term_id"))
        .sortWithinPartitions("term_id", "doc_id", "pos")
        .mapInPandas(_make_pack_positions(lo, width, n_buckets), POSITIONS_SCHEMA)
        .withColumn("tb", shard_from_id_col(F.col("term_id"), cfg.n_segments))
    )
    pos_dir = os.path.join(out_dir, "positions")
    packed.write.mode("overwrite").partitionBy("tb").parquet(pos_dir)
    cfg.save(out_dir)
    with open(os.path.join(out_dir, "positions_meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "format_version": 1}, f)
    return out_dir


def _term_doc_positions(
    dataset, term_ids: list[int], n_segments: int
) -> dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """term_id -> (doc_ids, counts, positions) concatenated over its rows."""
    import pyarrow.compute as pc

    qids = sorted(set(term_ids))
    tbs = sorted({i % n_segments for i in qids})
    flt = pc.field("tb").isin(tbs) & pc.field("term_id").isin(qids)
    per: dict[int, list[tuple[np.ndarray, np.ndarray, np.ndarray]]] = {}
    for r in dataset.to_table(filter=flt).to_pylist():
        ids = delta_decode(varbyte_decode(bytes(r["doc_ids_bin"]))).astype(np.int64)
        counts = varbyte_decode(bytes(r["pos_counts_bin"]))
        pos = _seg_cumsum(varbyte_decode(bytes(r["pos_bin"])), counts)
        per.setdefault(r["term_id"], []).append((ids, counts, pos))
    out = {}
    for tid, chunks in per.items():
        out[tid] = (
            np.concatenate([c[0] for c in chunks]),
            np.concatenate([c[1] for c in chunks]),
            np.concatenate([c[2] for c in chunks]),
        )
    return out


def phrase_topk(
    index_dir: str,
    phrase: str,
    k: int = 10,
    cfg: EngineConfig | None = None,
) -> list[tuple[int, int]]:
    """Top-k (doc_id, phrase_tf) of docs containing the EXACT token
    sequence; ties break doc_id ascending. Fully vectorized verification:
    term i contributes keys (doc_ordinal, pos - i); the intersection across
    all terms is the set of phrase start positions.
    """
    import pyarrow.dataset as ds

    cfg = cfg or EngineConfig.load(index_dir)
    if not os.path.exists(os.path.join(index_dir, "positions_meta.json")):
        raise FileNotFoundError(
            f"{index_dir} has no positional side index — run build_positions"
        )
    dataset = ds.dataset(
        os.path.join(index_dir, "positions"), format="parquet", partitioning="hive"
    )
    qterms = tokenize_py(phrase, cfg)  # ORDER MATTERS — not deduped/sorted
    if not qterms:
        return []
    tids = [term_id_py(t) for t in qterms]
    data = _term_doc_positions(dataset, tids, cfg.n_segments)
    if any(t not in data for t in tids):
        return []  # some phrase term matches nothing

    # candidate docs: intersection of each term's doc set
    cand = None
    for t in set(tids):
        d = np.unique(data[t][0])
        cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
    if cand.size == 0:
        return []

    # per term: (doc ordinal, adjusted position) packed into one int64 key;
    # positions are bounded per doc, so M = max_pos + len(phrase) + 1 makes
    # the packing collision-free and ordinals keep the product in range
    M = 0
    for t in set(tids):
        if data[t][2].size:
            M = max(M, int(data[t][2].max()))
    M = M + len(qterms) + 2
    keys = None
    for i, t in enumerate(tids):
        ids, counts, pos = data[t]
        ords = np.searchsorted(cand, ids)
        keep = (ords < cand.size) & (cand[np.minimum(ords, cand.size - 1)] == ids)
        doc_ord = np.repeat(ords[keep], counts[keep].astype(np.int64))
        doc_pos = pos[np.repeat(keep, counts.astype(np.int64))].astype(np.int64)
        adj = doc_pos - i
        valid = adj >= 0
        kk = doc_ord[valid] * M + adj[valid]
        keys = kk if keys is None else np.intersect1d(keys, kk)
        if keys.size == 0:
            return []

    ords, tfs = np.unique(keys // M, return_counts=True)
    doc_ids = cand[ords]
    n = doc_ids.size
    if n > k:
        kth = np.partition(tfs, n - k)[n - k]
        sel = np.flatnonzero(tfs >= kth)
        order = np.lexsort((doc_ids[sel], -tfs[sel]))[:k]
        pick = sel[order]
    else:
        pick = np.lexsort((doc_ids, -tfs))[:k]
    return [(int(doc_ids[i]), int(tfs[i])) for i in pick]
