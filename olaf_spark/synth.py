"""Deterministic synthetic `pages` corpus (BASELINE.json input_hint shape).

    pages: url string, warc_ts timestamp, html binary, text string, lang string

Generated fully inside Spark (no driver-side row loops): doc_ids come from
``spark.range``, text from a seeded per-row hash chain, so the corpus is
byte-identical for a given (n_docs, seed) at any parallelism/partitioning —
the determinism the reference demands of its extraction step.

Zipf-ish vocabulary per FIXTURES.md §1: V terms with rank-biased selection,
doc length lognormal-ish, planted rare "needle" terms for exact-retrieval
tests, and an HTML template (boilerplate + nav + <script>) that extraction
must strip back to the exact `text`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50_000
ZIPF_S = 1.07
NEEDLE_EVERY = 97  # docs whose id % NEEDLE_EVERY == 0 get a unique needle term

# Visible text must be exactly `text` after tag/script/style stripping —
# boilerplate lives in attributes, <script> and <style> bodies only.
_HTML_PRE = (
    "<html><head><title></title><style>body{color:#000;font:12px sans}</style>"
    "<script>var nav = ['home', 'about']; if (nav.length < 3) { nav.push('x'); }</script></head>"
    '<body><nav data-links="home about"><a href="/home"></a> <a href="/about"></a></nav><p>'
)
_HTML_POST = '</p><footer data-src="generated corpus"></footer></body></html>'


def _word(rank_col):
    """term string for a vocabulary rank: 'w<rank>' (stable, tokenizer-safe)."""
    return F.concat(F.lit("w"), rank_col.cast("string"))


def gen_pages(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Deterministic pages table; same bytes for same (n_docs, seed)."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "doc_id")

    # doc length: deterministic pseudo-lognormal in [10, 400] tokens
    h0 = F.abs(F.xxhash64(F.col("doc_id"), F.lit(seed)))
    doc_len = (F.exp((h0 % 1000) / F.lit(1000.0) * F.lit(2.2) + F.lit(3.0))).cast("int")
    ids = ids.withColumn("doc_len", F.greatest(F.lit(10), F.least(F.lit(400), doc_len)))

    # token stream: one row per (doc_id, k), k < doc_len; rank via inverse-CDF
    # of a Zipf-ish distribution computed from a per-(doc,k) hash.
    toks = ids.select("doc_id", "doc_len", F.explode(F.sequence(F.lit(0), F.col("doc_len") - 1)).alias("k"))
    u = (F.abs(F.xxhash64("doc_id", "k", F.lit(seed + 1))) % 1_000_000_007) / F.lit(1_000_000_007.0)
    # inverse CDF of Zipf(s) over [1, V]:  rank = ceil( (u * (V^(1-s)-1) + 1) ^ (1/(1-s)) )
    one_minus_s = 1.0 - ZIPF_S
    v_pow = math.pow(VOCAB_SIZE, one_minus_s)
    rank = F.ceil(F.pow(u * F.lit(v_pow - 1.0) + F.lit(1.0), F.lit(1.0 / one_minus_s)))
    toks = toks.withColumn("term", _word(rank.cast("long")))

    text = toks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("k", "term"))), lambda s: s["term"]), " "
        ).alias("body")
    )

    # plant needles: unique term 'needle<doc_id>' appended to every 97th doc
    text = text.withColumn(
        "text",
        F.when(
            F.col("doc_id") % NEEDLE_EVERY == 0,
            F.concat(F.col("body"), F.lit(" needle"), F.col("doc_id").cast("string")),
        ).otherwise(F.col("body")),
    ).drop("body")

    site = F.col("doc_id") % 997
    url = F.concat(F.lit("https://example"), site.cast("string"), F.lit(".test/"), F.lpad(F.col("doc_id").cast("string"), 8, "0"))
    warc_ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id").cast("double"))
    lang = F.when(F.col("doc_id") % 20 == 0, F.lit("xx")).otherwise(F.lit("en"))
    html = F.encode(F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST)), "utf-8")

    return text.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        lang.alias("lang"),
        F.col("doc_id"),
    )


def gen_queries(spark: SparkSession, pages: DataFrame, n_queries: int = 50, seed: int = 42) -> DataFrame:
    """Reference query set (FIXTURES.md §2): phrase / zipf-mix / needle / OOV."""
    docs = pages.select("doc_id", "text").where(F.col("doc_id") % 7 == 3).limit(n_queries)
    phrase = docs.select(
        (F.col("doc_id") * 4).alias("query_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 3, 6), " ").alias("query_text"),
        F.col("doc_id").alias("expected_doc_id"),
    )
    needle = pages.select("doc_id").where(F.col("doc_id") % NEEDLE_EVERY == 0).limit(n_queries).select(
        (F.col("doc_id") * 4 + 1).alias("query_id"),
        F.concat(F.lit("needle"), F.col("doc_id").cast("string")).alias("query_text"),
        F.col("doc_id").alias("expected_doc_id"),
    )
    mix = docs.select(
        (F.col("doc_id") * 4 + 2).alias("query_id"),
        F.concat(
            _word(F.abs(F.xxhash64("doc_id", F.lit(seed))) % 50 + 1), F.lit(" "),
            _word(F.abs(F.xxhash64("doc_id", F.lit(seed + 1))) % 500 + 1), F.lit(" "),
            _word(F.abs(F.xxhash64("doc_id", F.lit(seed + 2))) % 5000 + 1),
        ).alias("query_text"),
        F.lit(None).cast("long").alias("expected_doc_id"),
    )
    oov = spark.range(0, 5).select(
        (F.col("id") * 4 + 3).alias("query_id"),
        F.concat(F.lit("zzqx"), F.col("id").cast("string")).alias("query_text"),
        F.lit(None).cast("long").alias("expected_doc_id"),
    )
    return phrase.unionByName(needle).unionByName(mix).unionByName(oov)
