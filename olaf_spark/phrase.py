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

Delta phase: positional rows are doc-disjoint and phrase_tf needs no
corpus statistics, so group serving is just "read every part's position
rows" — phrase_topk automatically includes any delta that carries its own
positions (append_index(..., with_positions=True) builds them alongside
the delta's postings), and refuses loudly if some delta lacks them
(silent partial answers would be worse). After compact_index, rebuild
positions once for the folded corpus (one shuffle, ~3x faster than the
main index build — no merge stage).
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
    "doc_ids_bin binary, pos_counts_bin binary, pos_bin binary, "
    "pos_offs array<long>"
)

#: positional layout version; 2 = per-doc byte offsets (lazy candidate
#: decode). Checked at read so a stale layout fails loudly.
POSITIONS_FORMAT_VERSION = 2

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

        # positions: ONE buffer per group, gap-encoded with an ABSOLUTE
        # restart at every doc boundary, plus each doc's byte offset inside
        # its group buffer — the lazy-decode seek table (phrase serving
        # decodes ONLY candidate docs' position runs, like the blocked
        # posting codec decodes only surviving blocks)
        from olaf_spark.codec import _varbyte_encode_arr, delta_encode_grouped

        pv = delta_encode_grouped(pos, doc_starts)
        buf, nbytes = _varbyte_encode_arr(pv)
        vstarts = np.concatenate([[0], np.cumsum(nbytes)])
        g_bytes = vstarts[g_rows]
        g_ends = np.append(g_bytes[1:], vstarts[-1])
        raw = buf.tobytes()
        pos_bufs = [raw[int(s):int(e)] for s, e in zip(g_bytes, g_ends)]
        doc_abs = vstarts[doc_starts]
        group_of_doc = np.searchsorted(g_rows, doc_starts, side="right") - 1
        rel = (doc_abs - g_bytes[group_of_doc]).astype(np.int64)
        pos_offs = [a.tolist() for a in np.split(rel, g_docs[1:])]

        return pd.DataFrame(
            {
                "term_id": terms[g_rows],
                "n_docs": n_docs.astype("int64"),
                "doc_ids_bin": encode_grouped(doc_ids, g_docs, delta=True),
                "pos_counts_bin": encode_grouped(counts, g_docs, delta=False),
                "pos_bin": pos_bufs,
                "pos_offs": pos_offs,
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
    # config-freeze invariant (olaf_config.h:46-50): when out_dir already
    # holds an index config (positions added to an existing index), the
    # caller's cfg must EQUAL it — silently overwriting would re-tokenize
    # the main postings under a different contract on the next load
    if os.path.exists(os.path.join(out_dir, "engine_config.json")):
        EngineConfig.load(out_dir).check_compatible(cfg)
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
        json.dump({"n_buckets": n_buckets, "format_version": POSITIONS_FORMAT_VERSION}, f)
    return out_dir


def _fetch_term_rows(dataset, term_ids: list[int], n_segments: int) -> dict[int, list[dict]]:
    """term_id -> rows with doc_ids/counts DECODED but positions RAW
    (buffer + per-doc offsets) — positions decode lazily per candidate."""
    import pyarrow.compute as pc

    qids = sorted(set(term_ids))
    tbs = sorted({i % n_segments for i in qids})
    flt = pc.field("tb").isin(tbs) & pc.field("term_id").isin(qids)
    tbl = dataset.to_table(filter=flt)
    per: dict[int, list[dict]] = {}
    tids_col = tbl["term_id"].to_pylist()
    id_col = tbl["doc_ids_bin"]
    cnt_col = tbl["pos_counts_bin"]
    pos_col = tbl["pos_bin"]
    offs_col = tbl["pos_offs"]
    for i, tid in enumerate(tids_col):
        # arrow-native access: a head term's pos_offs holds one long per doc
        # (hundreds of thousands) — .values.to_numpy() is a buffer view,
        # where a to_pylist() round-trip built million-element Python lists
        # per query (measured ~2x on head-term phrases)
        per.setdefault(tid, []).append(
            dict(
                ids=delta_decode(varbyte_decode(id_col[i].as_py())).astype(np.int64),
                counts=varbyte_decode(cnt_col[i].as_py()).astype(np.int64),
                buf=pos_col[i].as_py(),
                offs=offs_col[i].values.to_numpy().astype(np.int64),
            )
        )
    return per


def _positions_for_docs(
    row: dict, keep: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(kept doc_ids, kept counts, kept positions).

    HYBRID decode — the same lesson as the blocked posting codec: per-run
    Python decode calls only pay when the kept set is SPARSE. A selective
    phrase (rare partner term) keeps a few hundred scattered docs -> slice
    + decode only their byte ranges as contiguous runs; a dense keep (both
    terms common) would shatter into tens of thousands of tiny runs, so
    decode the whole buffer once and mask instead.
    """
    idx = np.flatnonzero(keep)
    if idx.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.uint64)
    ids, counts, buf, offs = row["ids"], row["counts"], row["buf"], row["offs"]
    n = ids.size
    cuts = np.flatnonzero(np.diff(idx) > 1) + 1
    n_runs = cuts.size + 1
    if idx.size * 4 > n or n_runs > 4096:
        # dense: one full decode + occurrence mask beats run shattering
        pos_all = _seg_cumsum(varbyte_decode(buf), counts)
        occ_keep = np.repeat(keep, counts)
        return ids[idx], counts[idx], pos_all[occ_keep]
    pos_l = []
    for run in np.split(idx, cuts):
        i0, i1 = int(run[0]), int(run[-1]) + 1
        lo = int(offs[i0])
        hi = int(offs[i1]) if i1 < n else len(buf)
        pos_l.append(_seg_cumsum(varbyte_decode(buf[lo:hi]), counts[i0:i1]))
    return ids[idx], counts[idx], np.concatenate(pos_l)


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
    import json

    import pyarrow.dataset as ds

    cfg = cfg or EngineConfig.load(index_dir)

    def _check_positions(d: str) -> None:
        meta_path = os.path.join(d, "positions_meta.json")
        if not os.path.exists(meta_path):
            raise FileNotFoundError(
                f"{d} has no positional side index — run build_positions "
                "(or append with with_positions=True)"
            )
        with open(meta_path) as f:
            found = json.load(f).get("format_version", 1)
        if found != POSITIONS_FORMAT_VERSION:
            raise ValueError(
                f"positions at {d} are format v{found}; this engine reads "
                f"v{POSITIONS_FORMAT_VERSION} — rebuild with build_positions"
            )

    # group serving: every live delta must carry its own positions (phrase
    # answers need no cross-part statistics, so the union of part rows IS
    # the group index; a delta without positions would silently vanish
    # from phrase results — refuse instead)
    from olaf_spark.incremental import _delta_dirs

    part_dirs = [index_dir] + _delta_dirs(index_dir)
    for d in part_dirs:
        _check_positions(d)
    datasets = [
        ds.dataset(os.path.join(d, "positions"), format="parquet", partitioning="hive")
        for d in part_dirs
    ]
    qterms = tokenize_py(phrase, cfg)  # ORDER MATTERS — not deduped/sorted
    if not qterms:
        return []
    tids = [term_id_py(t) for t in qterms]
    # parts fetch concurrently (pyarrow releases the GIL) — group latency
    # tracks the slowest part, not the sum, as deltas accumulate
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(datasets))) as ex:
        fetched = list(
            ex.map(lambda dd: _fetch_term_rows(dd, tids, cfg.n_segments), datasets)
        )
    data: dict[int, list[dict]] = {}
    for part_rows in fetched:
        for tid, rows in part_rows.items():
            data.setdefault(tid, []).extend(rows)
    if any(t not in data for t in tids):
        return []  # some phrase term matches nothing

    # candidate docs: intersection of each term's doc set — computed from
    # the (cheap) doc-id headers BEFORE any position bytes are touched, so
    # a head-term phrase with one selective term only ever decodes the
    # selective candidate set's positions
    cand = None
    for t in set(tids):
        d = np.unique(np.concatenate([r["ids"] for r in data[t]]))
        cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
    # merge-on-read deletes apply here like every other query path: the
    # union of part tombstones drops candidates before any position decode
    ts: set[int] = set()
    for d_ in part_dirs:
        ts_path = os.path.join(d_, "tombstones.json")
        if os.path.exists(ts_path):
            with open(ts_path) as f:
                ts |= set(json.load(f))
    if ts and cand.size:
        cand = cand[~np.isin(cand, np.fromiter(ts, dtype=np.int64))]
    if cand.size == 0:
        return []

    # decode ONLY candidate docs' positions, ONCE per UNIQUE term (a
    # repeated phrase term reuses its decode; only the adjustment differs)
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # (doc_ord, pos)
    max_pos = 0
    for t in dict.fromkeys(tids):
        ords_l, pos_l = [], []
        for row in data[t]:
            pos_idx = np.searchsorted(cand, row["ids"])
            keep = (pos_idx < cand.size) & (
                cand[np.minimum(pos_idx, cand.size - 1)] == row["ids"]
            )
            kids, kcounts, kpos = _positions_for_docs(row, keep)
            if kids.size == 0:
                continue
            ords_l.append(np.repeat(np.searchsorted(cand, kids), kcounts))
            pos_l.append(kpos.astype(np.int64))
        if not ords_l:
            return []
        ords = np.concatenate(ords_l)
        pos = np.concatenate(pos_l)
        if pos.size:
            max_pos = max(max_pos, int(pos.max()))
        decoded[t] = (ords, pos)
    per_term = [decoded[t] for t in tids]

    # (doc ordinal, adjusted position) packed into one int64 key; positions
    # are bounded per doc, so M = max_pos + len(phrase) + 2 makes the
    # packing collision-free and ordinals keep the product in int64 range
    M = max_pos + len(qterms) + 2
    keys = None
    for i, (ords, pos) in enumerate(per_term):
        adj = pos - i
        valid = adj >= 0
        kk = ords[valid] * M + adj[valid]
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
