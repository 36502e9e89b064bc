"""BM25 top-k query path — DataFrame implementation.

Reference analogue: Olaf's query pipeline (`olaf_fp_matcher.c`): per query
fingerprint a range scan into the posting store, hits tallied in a hash
accumulator keyed by doc, threshold + bounded top-k sort. Here:

    query terms  -> broadcast join against postings   (olaf_db_find, :337-398)
    per-doc sum  -> groupBy(doc_id) BM25 accumulation (tally_results, :148-186)
    top-k        -> orderBy(score desc, doc_id).limit (print_results, :275-341)

Scale notes (100 TB / 1000 executors):
  * The query-term side is tiny -> always broadcast; the postings side is
    only *scanned* on the joined terms — with postings stored
    partitioned/sorted by term, Catalyst pushes `term IN (...)` to the
    parquet scan, so a 10-term query reads ~10 posting lists, not the corpus.
  * groupBy(doc_id) does map-side partial aggregation; the shuffle carries
    at most (matched docs) rows.
  * Spark plans orderBy+limit as TakeOrderedAndProject — a distributed
    bounded heap, never a full sort.

Determinism (SURVEY §7.5-1): per-doc contributions are collected, sorted by
term, and folded in ascending-term order in float64 — the exact accumulation
order of the pure-Python oracle — so scores are reproducible across
partitionings and parallelism levels. Tie-break: (score desc, doc_id asc).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olaf_spark.config import EngineConfig
from olaf_spark.tokenize import doc_lengths_df, term_freqs_df, tokenize_py

_DEFAULT = EngineConfig()


def corpus_stats(doc_lengths: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — one tiny action at build time; cached in index metadata."""
    row = doc_lengths.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def query_term_idfs(
    spark: SparkSession,
    query_text: str,
    term_stats: DataFrame,
    n_docs: int,
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """Small DF (term, idf) for the distinct query terms.

    term_stats: (term, df). The filter is a pushdown-able IN-list, so with
    term-sorted parquet this touches a handful of row groups.
    """
    qterms = sorted(set(tokenize_py(query_text, cfg)))
    if not qterms:
        return spark.createDataFrame([], "term string, idf double")
    rows = (
        term_stats.where(F.col("term").isin(qterms))
        .select("term", "df")
        .collect()
    )
    data = [(t, idf(n_docs, int(d))) for t, d in rows]
    return spark.createDataFrame(data, "term string, idf double")


def bm25_scores(
    postings_flat: DataFrame,
    qidf: DataFrame,
    avgdl: float,
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_id, score) for every doc matching >=1 query term.

    postings_flat: (term, doc_id, tf, doc_len) — doc_len denormalized into
    the posting at build time so the query path has ONE join (vs. a second
    big-big join against docs_meta).
    """
    contrib = (
        F.col("idf")
        * F.col("tf")
        * F.lit(cfg.k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(cfg.k1)
            * (F.lit(1.0 - cfg.b) + F.lit(cfg.b) * F.col("doc_len") / F.lit(avgdl))
        )
    )
    hits = postings_flat.join(F.broadcast(qidf), "term").select(
        "doc_id", "term", contrib.alias("contrib")
    )
    # deterministic fold: sort contributions by term, accumulate left-to-right
    # in float64 — identical order to the pure-Python oracle.
    return hits.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )


def topk(scores: DataFrame, k: int) -> DataFrame:
    """(doc_id, score, rank) — bounded top-k, deterministic tie-break."""
    out = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    # rank over the k surviving rows only — the window runs on <=k rows, the
    # heavy lifting stays in TakeOrderedAndProject.
    w = F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
    return out.withColumn("rank", w).select("doc_id", "score", "rank")


class AdhocIndex:
    """In-session index: tokenized corpus cached once, queried many times.

    The materialized (parquet-backed, compressed) index lives in indexer.py;
    this one holds the same logical artifacts as cached DataFrames — the
    semantics referent, and what tests/benchmarks use for repeated queries.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        cfg: EngineConfig = _DEFAULT,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.cfg = cfg
        tf = term_freqs_df(docs, text_col, id_col, cfg)
        dl = doc_lengths_df(docs, text_col, id_col, cfg)
        self.postings_flat = (
            tf.join(dl, "doc_id").select("term", "doc_id", "tf", "doc_len").cache()
        )
        self.term_stats = (
            self.postings_flat.groupBy("term").agg(F.count("*").alias("df")).cache()
        )
        self.n_docs, self.avgdl = corpus_stats(dl)

    def topk(self, query_text: str, k: int = 10) -> DataFrame:
        qidf = query_term_idfs(self.spark, query_text, self.term_stats, self.n_docs, self.cfg)
        return topk(bm25_scores(self.postings_flat, qidf, self.avgdl, self.cfg), k)

    def unpersist(self):
        self.postings_flat.unpersist()
        self.term_stats.unpersist()


def bm25_topk_adhoc(
    spark: SparkSession,
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    cfg: EngineConfig = _DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end BM25 top-k without a prebuilt index (tokenizes the corpus).

    The materialized-index path lives in indexer.py; this ad-hoc path is the
    semantics referent and the oracle-checked query.
    """
    tf = term_freqs_df(docs, text_col, id_col, cfg)
    dl = doc_lengths_df(docs, text_col, id_col, cfg)
    n_docs, avgdl = corpus_stats(dl)
    term_stats = tf.groupBy("term").agg(F.count("*").alias("df"))
    qidf = query_term_idfs(spark, query_text, term_stats, n_docs, cfg)
    postings_flat = tf.join(dl, "doc_id").select("term", "doc_id", "tf", "doc_len")
    return topk(bm25_scores(postings_flat, qidf, avgdl, cfg), k)
