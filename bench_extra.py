"""Optimization-round measurement harness (guide §1.4: noop-sink isolation).

NOT the driver bench — bench.py is frozen for measurement. This file times
individual operators with the noop sink, captures .explain("formatted") to
plans/<round>/, and prints a JSON line per meter so before/after numbers in
OPTIMIZATION_r06.md are reproducible.

Usage:
  python bench_extra.py headline [sf_dir]     # the 10 headline queries
  python bench_extra.py batch [sf_dir]        # batch32 / batch1024 scorers
  python bench_extra.py plans [sf_dir] [tag]  # write plans/r06/<q>_<tag>.txt
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from olaf_spark import entry_queries  # noqa: E402
from olaf_spark.session import get_spark, prewarm_python_workers  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
HEADLINE = [
    "tokenize_tf", "term_stats", "bm25_topk", "match_tally",
    "top_terms_per_lang", "dedup_exact", "events_hourly", "lineitem_agg",
    "orders_by_nation", "embedding_cosine_topk",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def meter(spark, name, fn, reps=REPS) -> dict:
    spark.sparkContext.setJobDescription(name)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return {"median": round(statistics.median(vals), 3),
            "best": round(min(vals), 3), "reps": reps,
            "loadavg": round(os.getloadavg()[0], 2)}


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus, app_name="bench_extra", shuffle_partitions=cpus)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    prewarm_python_workers(spark)
    out: dict = {"mode": mode, "sf_dir": sf_dir,
                 "loadavg": round(os.getloadavg()[0], 2)}

    if mode == "headline":
        # warmup pass (codegen compile etc.)
        for name in HEADLINE:
            force(entry_queries.QUERIES[name](spark, sf_dir))
        for name in HEADLINE:
            fn = entry_queries.QUERIES[name]
            out[name] = meter(spark, name, lambda: force(fn(spark, sf_dir)))
        out["total_median"] = round(
            sum(v["median"] for k, v in out.items() if isinstance(v, dict)), 3)

    elif mode == "batch":
        import tempfile

        from olaf_spark.batch import batch_query_index
        from olaf_spark.config import EngineConfig
        from olaf_spark.indexer import build_index

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        with tempfile.TemporaryDirectory() as tmp:
            t0 = time.perf_counter()
            index = build_index(spark, docs, f"{tmp}/ix", EngineConfig(), n_buckets=16)
            out["index_build_s"] = round(time.perf_counter() - t0, 3)
            b32 = [(i, f"spark join window w{i}" if i % 2 else f"data query filter w{i}")
                   for i in range(32)]
            b1024 = [(i, f"spark join window w{i % 200}" if i % 2
                      else f"data query filter w{i % 97}") for i in range(1024)]
            force(batch_query_index(spark, index, b32, k=10))  # warmup
            out["bm25_batch32"] = meter(
                spark, "bm25_batch32",
                lambda: force(batch_query_index(spark, index, b32, k=10)))
            out["bm25_batch1024"] = meter(
                spark, "bm25_batch1024",
                lambda: force(batch_query_index(spark, index, b1024, k=10)))

    elif mode == "plans":
        tag = sys.argv[3] if len(sys.argv) > 3 else "before"
        pdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r06")
        os.makedirs(pdir, exist_ok=True)
        for name in HEADLINE:
            df = entry_queries.QUERIES[name](spark, sf_dir)
            with open(os.path.join(pdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        out["written"] = pdir

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
