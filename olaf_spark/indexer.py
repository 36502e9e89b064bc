"""Distributed index build: segments -> merge -> global packed postings.

Reference analogue: Olaf's two-phase bulk build (`README.md:260-272`,
`cli/olaf_cli_cmd_cache.zig` + `store_cached`): extract fingerprints to
partition-local files fully in parallel (map), then merge them into the
single sorted LMDB store (reduce). Here the same shape, Spark-first:

  stage 1 (segments): tokenize -> (term, doc_id, tf, doc_len)
      -> bucket by doc_id RANGE  (so per-(term,bucket) runs are sorted AND
         disjoint — merging is concatenation, not a k-way merge)
      -> groupBy(term, bucket).applyInPandas(pack)  [numpy delta+varbyte]
      -> parquet append, partitioned by bucket, one lineage row per bucket

  stage 2 (merge): read segments -> groupBy(term).applyInPandas(merge runs
      in bucket order, re-encode once, compute block-max WAND metadata)
      -> global postings parquet, range-partitioned + sorted by term

Skew (north_rule / SURVEY §7.5-2): a head term's postings arrive as many
bucket-runs built in parallel — no single task ever holds more than one
bucket of one term at stage 1. Olaf's answer was a hard cap that drops
postings (maxDBCollisions=2000, olaf_db.c:366-375); ours keeps every
posting and bounds task memory by bucket width instead. At stage 2 a
mega-term still merges in one task; bucket_width bounds that too (the
merge is streaming concat of pre-packed runs).

Resume (north_rule): each stage-1 bucket commits a lineage row; a
restarted build reads the lineage table, skips completed buckets, and
appends only the missing ones — idempotent because bucket contents are a
pure function of (corpus, config).

At 10^12 docs: buckets are doc_id ranges -> stage 1 reads each input
partition once, shuffles (term, bucket)-grouped rows; stage 2 shuffles
packed runs (already ~10x smaller than raw postings). Doc lengths are
packed INTO each posting row, so query-time scoring needs no side lookup
table on executors.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olaf_spark.codec import block_maxes, pack_postings, unpack_postings, varbyte_decode, varbyte_encode
from olaf_spark.config import EngineConfig
from olaf_spark.scorer import idf, postings_flat_df

SEGMENT_SCHEMA = (
    "term string, bucket int, n_docs long, "
    "doc_ids_bin binary, tfs_bin binary, doc_lens_bin binary"
)

POSTINGS_SCHEMA = (
    "term string, df long, doc_ids_bin binary, tfs_bin binary, doc_lens_bin binary, "
    "block_lasts array<long>, block_maxes array<double>"
)


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """(term, bucket) group -> one packed segment row. Runs on executors."""
    pdf = pdf.sort_values("doc_id")
    ids = pdf["doc_id"].to_numpy(dtype=np.uint64)
    tfs = pdf["tf"].to_numpy(dtype=np.uint64)
    dls = pdf["doc_len"].to_numpy(dtype=np.uint64)
    id_buf, tf_buf = pack_postings(ids, tfs)
    dl_buf = varbyte_encode(dls)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "bucket": [int(pdf["bucket"].iloc[0])],
            "n_docs": [len(ids)],
            "doc_ids_bin": [id_buf],
            "tfs_bin": [tf_buf],
            "doc_lens_bin": [dl_buf],
        }
    )


def _make_merge_fn(n_docs: int, avgdl: float, cfg: EngineConfig):
    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size

    def _merge_term(pdf: pd.DataFrame) -> pd.DataFrame:
        """All bucket-runs of one term -> one global posting row.

        Runs are sorted by doc_id within a bucket and buckets are disjoint
        doc_id ranges, so concatenation in bucket order IS the merge
        (Olaf's store_cached bulk load, sorted B+tree insert analogue).
        """
        pdf = pdf.sort_values("bucket")
        ids = np.concatenate([
            unpack_postings(r.doc_ids_bin, r.tfs_bin)[0] for r in pdf.itertuples()
        ]) if len(pdf) else np.empty(0, dtype=np.uint64)
        tfs = np.concatenate([
            varbyte_decode(r.tfs_bin) for r in pdf.itertuples()
        ]) if len(pdf) else np.empty(0, dtype=np.uint64)
        dls = np.concatenate([
            varbyte_decode(r.doc_lens_bin) for r in pdf.itertuples()
        ]) if len(pdf) else np.empty(0, dtype=np.uint64)
        df_term = int(ids.size)
        w = idf(n_docs, df_term)
        lasts, bmax = block_maxes(
            ids, tfs.astype(np.float64), dls.astype(np.float64),
            w, k1, b, avgdl, block_size,
        )
        id_buf, tf_buf = pack_postings(ids, tfs)
        dl_buf = varbyte_encode(dls)
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "df": [df_term],
                "doc_ids_bin": [id_buf],
                "tfs_bin": [tf_buf],
                "doc_lens_bin": [dl_buf],
                "block_lasts": [lasts.tolist()],
                "block_maxes": [bmax.tolist()],
            }
        )

    return _merge_term


class Index:
    """A materialized index directory (parquet + json metadata)."""

    def __init__(self, index_dir: str, cfg: EngineConfig, stats: dict):
        self.index_dir = index_dir
        self.cfg = cfg
        self.stats = stats

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]

    @property
    def avgdl(self) -> float:
        return self.stats["avgdl"]

    @classmethod
    def load(cls, index_dir: str, query_cfg: EngineConfig | None = None) -> "Index":
        cfg = EngineConfig.load(index_dir)
        if query_cfg is not None:
            cfg.check_compatible(query_cfg)  # olaf_config.h:46-50 invariant
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        return cls(index_dir, cfg, stats)

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.index_dir, "postings"))

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.index_dir, "lineage"))


def _lineage_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        pd.DataFrame(rows),
        "stage string, partition_id long, input_rows long, output_rows long, "
        "wall_s double, rows_per_s double, bytes_out long, status string, ts double",
    )


def completed_buckets(spark: SparkSession, index_dir: str) -> set[int]:
    lin_dir = os.path.join(index_dir, "lineage")
    if not os.path.exists(lin_dir):
        return set()
    rows = (
        spark.read.parquet(lin_dir)
        .where((F.col("stage") == "segments") & (F.col("status") == "done"))
        .select("partition_id")
        .collect()
    )
    return {int(r["partition_id"]) for r in rows}


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
    resume: bool = False,
) -> Index:
    """Build (or resume) a materialized index at index_dir."""
    cfg = cfg or EngineConfig()
    t_start = time.time()
    if not resume and os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    cfg.save(index_dir)

    seg_dir = os.path.join(index_dir, "segments")
    post_dir = os.path.join(index_dir, "postings")
    lin_dir = os.path.join(index_dir, "lineage")

    # ---- corpus stats (one metadata count + one light agg) ----------------
    n_docs = docs.count()
    bounds = docs.agg(
        F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
    ).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    bucket_width = max(1, math.ceil((hi - lo + 1) / n_buckets))

    pf = postings_flat_df(docs, text_col, id_col, cfg)
    pf = pf.withColumn(
        "bucket", ((F.col("doc_id") - F.lit(lo)) / F.lit(bucket_width)).cast("int")
    )

    # ---- stage 1: partition-local packed segments (resumable) -------------
    done = completed_buckets(spark, index_dir) if resume else set()
    todo_pf = pf.where(~F.col("bucket").isin(sorted(done))) if done else pf

    t0 = time.time()
    seg = todo_pf.groupBy("term", "bucket").applyInPandas(_pack_group, SEGMENT_SCHEMA)
    (
        seg.repartition(F.col("bucket"))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(seg_dir)
    )
    seg_wall = time.time() - t0

    # lineage: one row per bucket actually built this run
    seg_stats = (
        spark.read.parquet(seg_dir)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("n_docs").alias("n_postings"),
            F.sum(F.length("doc_ids_bin") + F.length("tfs_bin") + F.length("doc_lens_bin")).alias("bytes_out"),
        )
        .collect()
    )
    lineage = []
    for r in seg_stats:
        bkt = int(r["bucket"])
        if bkt in done:
            continue
        lineage.append(
            dict(
                stage="segments", partition_id=bkt,
                input_rows=int(r["n_postings"]), output_rows=int(r["n_terms"]),
                wall_s=seg_wall, rows_per_s=(int(r["n_postings"]) / seg_wall if seg_wall > 0 else 0.0),
                bytes_out=int(r["bytes_out"]), status="done", ts=time.time(),
            )
        )
    if lineage:
        _lineage_rows(spark, lineage).write.mode("append").parquet(lin_dir)

    # ---- global stats (from segments, so resume sees the full corpus) -----
    total_tf_row = (
        spark.read.parquet(seg_dir)
        .agg(F.sum("n_docs").alias("n_postings"))
        .collect()[0]
    )
    # avgdl = total tokens / all docs; sum of tf over the full corpus counts
    # each kept token exactly once (pf always covers the whole corpus, even
    # on resume — only the segment WRITE is restricted to missing buckets).
    total_tf = int(pf.agg(F.sum("tf")).collect()[0][0] or 0)
    avgdl = total_tf / n_docs if n_docs else 0.0

    # ---- stage 2: merge bucket-runs into global postings -------------------
    t0 = time.time()
    merge_fn = _make_merge_fn(n_docs, avgdl, cfg)
    segments = spark.read.parquet(seg_dir)
    postings = segments.groupBy("term").applyInPandas(merge_fn, POSTINGS_SCHEMA)
    (
        postings.repartitionByRange(cfg.n_segments, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(post_dir)
    )
    merge_wall = time.time() - t0

    post_stats = (
        spark.read.parquet(post_dir)
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("df").alias("n_postings"),
            F.sum(F.length("doc_ids_bin") + F.length("tfs_bin") + F.length("doc_lens_bin")).alias("bytes"),
        )
        .collect()[0]
    )
    _lineage_rows(
        spark,
        [
            dict(
                stage="merge", partition_id=-1,
                input_rows=int(total_tf_row["n_postings"] or 0),
                output_rows=int(post_stats["n_terms"]),
                wall_s=merge_wall,
                rows_per_s=(int(post_stats["n_postings"] or 0) / merge_wall if merge_wall > 0 else 0.0),
                bytes_out=int(post_stats["bytes"] or 0), status="done", ts=time.time(),
            )
        ],
    ).write.mode("append").parquet(lin_dir)

    stats = dict(
        n_docs=n_docs,
        avgdl=avgdl,
        total_tokens=total_tf,
        n_terms=int(post_stats["n_terms"]),
        n_postings=int(post_stats["n_postings"] or 0),
        packed_bytes=int(post_stats["bytes"] or 0),
        n_buckets=n_buckets,
        bucket_width=bucket_width,
        build_wall_s=time.time() - t_start,
        docs_per_s=(n_docs / (time.time() - t_start)),
    )
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return Index(index_dir, cfg, stats)
