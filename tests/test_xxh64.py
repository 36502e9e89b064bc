"""Property test: the pure-Python XXH64 twin is bit-identical to Spark's
`xxhash64` expression — the contract that lets the serving path compute
term_ids without a JVM (olaf_spark/indexer.py term_id_py)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from olaf_spark.xxh64 import xxh64


def test_xxh64_matches_spark(spark):
    rng = random.Random(7)
    # edge lengths hit every code path: <4, 4..7, 8..31, >=32 bytes,
    # multi-byte UTF-8, and the empty string
    samples = ["", "a", "abc", "hello", "needle97", "пример", "日本語テキスト",
               "x" * 7, "y" * 8, "z" * 31, "q" * 32, "r" * 100] + [
        "".join(rng.choices(string.ascii_lowercase + string.digits + "_-",
                            k=rng.randint(1, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string").select(
        "t", F.xxhash64("t").alias("h")
    )
    jvm = {r["t"]: r["h"] for r in df.collect()}
    for s in samples:
        assert jvm[s] == xxh64(s.encode("utf-8")), s


def test_term_id_twins(spark):
    from olaf_spark.indexer import term_id_col, term_id_py

    terms = ["w1", "spark", "join", "window", "needle97", "überraschung"]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", term_id_col(F.col("term")).alias("tid")
    )
    jvm = {r["term"]: r["tid"] for r in df.collect()}
    for t in terms:
        assert jvm[t] == term_id_py(t), t
