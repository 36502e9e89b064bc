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
    query_text: str,
    term_stats: DataFrame,
    n_docs: int,
    cfg: EngineConfig = _DEFAULT,
) -> list[tuple[str, float]]:
    """[(term, idf)] for the distinct query terms, ascending term order.

    Returned as plain literals, NOT a DataFrame: a createDataFrame-backed
    side would be a Python-RDD ExistingRDD, and broadcasting one costs
    seconds of Python-worker spin-up per query. The query side of the
    posting join is a handful of constants — it belongs in the plan as
    literals (isin filter + chained CASE WHEN), fully codegen'd.

    term_stats: (term, df). The isin filter pushes down, so with
    term-sorted parquet this touches a handful of row groups.
    """
    qterms = sorted(set(tokenize_py(query_text, cfg)))
    if not qterms:
        return []
    rows = (
        term_stats.where(F.col("term").isin(qterms))
        .select("term", "df")
        .collect()
    )
    dfs = {r["term"]: int(r["df"]) for r in rows}
    return [(t, idf(n_docs, dfs[t])) for t in qterms if t in dfs]


def postings_flat_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(term, doc_id, tf, doc_len) in ONE tokenize pass.

    doc_len is recovered from tf itself (sum of tfs per doc == kept-token
    count) via a window over the doc_id shuffle the groupBy already needs —
    no second scan/tokenize of the corpus, no join against docs_meta.
    """
    tf = term_freqs_df(docs, text_col, id_col, cfg)
    w = Window.partitionBy("doc_id")
    return tf.select(
        "term", "doc_id", "tf", F.sum("tf").over(w).alias("doc_len")
    )


def bm25_scores(
    postings_flat: DataFrame,
    qidf: list[tuple[str, float]],
    avgdl: float,
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_id, score) for every doc matching >=1 query term.

    postings_flat: (term, doc_id, tf, doc_len) — doc_len denormalized into
    the posting at build time so the query path has NO join at all: the
    query terms enter the plan as an isin predicate (pushed to the scan)
    plus a chained CASE WHEN for idf — whole-stage codegen end to end.
    """
    if not qidf:
        return (
            postings_flat.select("doc_id")
            .where(F.lit(False))
            .withColumn("score", F.lit(0.0).cast("double"))
        )
    terms = [t for t, _ in qidf]
    idf_expr = F.lit(None).cast("double")
    for t, w in qidf:
        idf_expr = F.when(F.col("term") == t, F.lit(w)).otherwise(idf_expr)
    # association order matches the oracle exactly: idf * (tf*(k1+1)/denom)
    contrib = idf_expr * (
        F.col("tf")
        * F.lit(cfg.k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(cfg.k1)
            * (F.lit(1.0 - cfg.b) + F.lit(cfg.b) * F.col("doc_len") / F.lit(avgdl))
        )
    )
    hits = postings_flat.where(F.col("term").isin(terms)).select(
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


def topk(scores: DataFrame, k: int, min_score: float = 0.0) -> DataFrame:
    """(doc_id, score, rank) — bounded top-k, deterministic tie-break.

    min_score > 0 drops candidates below the threshold BEFORE the heap —
    Olaf's minMatchCount quality gate (olaf_config.c:89-94): low-evidence
    matches never enter the result set. The filter rides the aggregate
    (no extra shuffle).
    """
    if min_score > 0.0:
        scores = scores.where(F.col("score") >= F.lit(float(min_score)))
    out = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    # rank over the k surviving rows only — the window runs on <=k rows, the
    # heavy lifting stays in TakeOrderedAndProject. The partition key is a
    # constant-valued but NON-foldable expression: all <=k rows land in one
    # partition (correct global rank) without WindowExec's no-partition
    # full-sort warning (a foldable literal would be optimized away).
    w = F.row_number().over(
        Window.partitionBy(F.col("doc_id") * F.lit(0)).orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
    )
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
        self.postings_flat = postings_flat_df(docs, text_col, id_col, cfg).cache()
        self.term_stats = (
            self.postings_flat.groupBy("term").agg(F.count("*").alias("df")).cache()
        )
        # N from a metadata-only count (no tokenize); avgdl = sum(tf)/N since
        # doc_len == number of kept tokens == sum of tfs per doc.
        self.n_docs = docs.count()
        total = self.postings_flat.agg(F.sum("tf")).collect()[0][0] or 0
        self.avgdl = total / self.n_docs if self.n_docs else 0.0
        # driver-side df memo (r6): each topk() otherwise pays one Spark
        # job just to collect its query terms' dfs from the CACHED
        # term_stats frame. dfs are immutable for this index's lifetime
        # (same lifetime as the cached frames), so repeated/overlapping
        # queries resolve idf with zero jobs. Bounded: only queried terms
        # enter (never the vocabulary); absent terms memoize as None.
        self._df_memo: dict[str, int | None] = {}

    def _term_idfs(self, qterms: list[str]) -> list[tuple[str, float]]:
        missing = [t for t in qterms if t not in self._df_memo]
        if missing:
            rows = (
                self.term_stats.where(F.col("term").isin(missing))
                .select("term", "df")
                .collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_memo[t] = found.get(t)
        return [
            (t, idf(self.n_docs, self._df_memo[t]))
            for t in qterms
            if self._df_memo[t] is not None
        ]

    def topk(self, query_text: str, k: int | None = None, min_score: float | None = None) -> DataFrame:
        k = self.cfg.max_results if k is None else k
        min_score = self.cfg.min_score if min_score is None else min_score
        qterms = sorted(set(tokenize_py(query_text, self.cfg)))
        qidf = self._term_idfs(qterms) if qterms else []
        return topk(bm25_scores(self.postings_flat, qidf, self.avgdl, self.cfg), k, min_score)

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
    min_score: float | None = None,
) -> DataFrame:
    """End-to-end BM25 top-k without a prebuilt index (tokenizes the corpus).

    The materialized-index path lives in indexer.py; this ad-hoc path is the
    semantics referent and the oracle-checked query.

    Routed through AdhocIndex so the tokenized corpus is cached for the
    plan's several actions AND released before returning — the round-3
    version stacked an unreferenced `.cache()` per call (an executor-memory
    leak for any external caller making repeated one-shot queries). The <=k
    result rows are materialized and returned as a local DataFrame; callers
    needing the LAZY plan for many queries should hold an AdhocIndex
    themselves (its .topk is this exact plan) and unpersist when done.
    """
    adhoc = AdhocIndex(spark, docs, cfg, text_col, id_col)
    try:
        out = adhoc.topk(query_text, k, min_score)
        rows = out.collect()
        schema = out.schema
    finally:
        adhoc.unpersist()
    return spark.createDataFrame(rows, schema)
