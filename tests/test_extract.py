"""Extraction byte-identity: pandas UDF vs pure-Python vs SQL expression.

The reference invariant (BASELINE input_hint; ffmpeg decode determinism
cli/olaf_cli_util_audio.zig:77-102): same bytes in -> same text out, on
every path, at index and query time.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from olaf_spark.extract import extract_text_py, extract_text_sql, extract_text_udf
from olaf_spark.synth import gen_pages


def test_udf_matches_python_on_synth(spark):
    pages = gen_pages(spark, 60, seed=7).cache()
    rows = pages.select(
        "url", "text", extract_text_udf(F.col("html")).alias("extracted"), "html"
    ).collect()
    assert len(rows) == 60
    for r in rows:
        assert r["extracted"] == r["text"], r["url"]
        assert extract_text_py(bytes(r["html"])) == r["text"], r["url"]


def test_sql_expression_matches(spark):
    pages = gen_pages(spark, 20, seed=9)
    pdf = pages.select("url", F.decode("html", "utf-8").alias("html_s"), "text").toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    expr = extract_text_sql("html_s")
    got = con.sql(f"select url, {expr} as extracted, text from pages").fetchall()
    for url, extracted, text in got:
        assert extracted == text, url


def test_extraction_is_deterministic_across_partitionings(spark):
    a = gen_pages(spark, 40, seed=3, partitions=1).select("url", "text")
    b = gen_pages(spark, 40, seed=3, partitions=8).select("url", "text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
