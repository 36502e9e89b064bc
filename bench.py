"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Each query is forced end-to-end with a noop write (full computation, no
collect-to-driver cost). Extra context keys (docs_per_s, parallelism) ride
along for BENCH history; the driver contract keys come first.

Repeated-run protocol (round 5): this box is SHARED — co-tenant load swings
identical runs by ±30% (BENCH.md "machine ceiling"), and a single
loaded-moment reading once masqueraded as a cross-round regression
(BENCH_r04 8.3 s vs 6.3-6.9 s for the same commit). So every wall-clock
meter now runs >= 3 times and reports {median, best, loadavg}; the flat
driver-contract keys carry the MEDIAN. The reference's own eval repeats
runs the same way (eval/olaf_benchmark/olaf_benchmark.rb:21-88).
best << median means the box was loaded mid-meter; compare medians across
rounds, and treat best as the machine-capability floor.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from olaf_spark import entry_queries  # noqa: E402
from olaf_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "tokenize_tf",
    "term_stats",
    "bm25_topk",
    "match_tally",
    "top_terms_per_lang",
    "dedup_exact",
    "events_hourly",
    "lineitem_agg",
    "orders_by_nation",
    "embedding_cosine_topk",
]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

METERS: dict[str, dict] = {}


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def meter(name: str, fn, reps: int = REPS) -> float:
    """Run fn() reps times; record {median, best, loadavg} under `name` and
    return the MEDIAN seconds (what the flat driver keys carry)."""
    la = round(os.getloadavg()[0], 2)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    METERS[name] = {
        "median": round(statistics.median(vals), 3),
        "best": round(min(vals), 3),
        "reps": reps,
        "loadavg": la,
    }
    return METERS[name]["median"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    loadavg_start = round(os.getloadavg()[0], 2)

    spark = get_spark(cpus, app_name="olaf_spark_bench", shuffle_partitions=cpus)
    # warm up the JVM + parquet footers + Python workers so per-query times
    # measure the plans, not fork/import constants
    from olaf_spark.session import prewarm_python_workers

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    prewarm_python_workers(spark)

    # warmup pass: first execution of each plan shape pays one-time
    # whole-stage-codegen compilation + shuffle-service init (~10 s on the
    # first query alone); a steady-state cluster has none of that per job.
    # cold_total_s is still reported for transparency.
    t0 = time.perf_counter()
    for name in BENCH_QUERIES:
        force(entry_queries.QUERIES[name](spark, sf_dir))
    cold_total = round(time.perf_counter() - t0, 3)

    # headline pass x REPS: per-query median so one loaded moment cannot
    # inflate a single query's official number
    runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    la_headline = round(os.getloadavg()[0], 2)
    for _ in range(REPS):
        for name in BENCH_QUERIES:
            fn = entry_queries.QUERIES[name]
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            runs[name].append(time.perf_counter() - t0)
    times = {name: round(statistics.median(v), 3) for name, v in runs.items()}
    METERS["headline_total"] = {
        "median": round(sum(times.values()), 3),
        "best": round(sum(min(v) for v in runs.values()), 3),
        "reps": REPS,
        "loadavg": la_headline,
    }

    # materialized index build + WAND serving latency
    import tempfile

    from olaf_spark.config import EngineConfig
    from olaf_spark.indexer import build_index
    from olaf_spark.wand import load_term_postings, vectorized_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        builds = iter(range(REPS))
        index = None

        def one_build():
            nonlocal index
            index = build_index(
                spark, docs, f"{tmp}/ix{next(builds)}", EngineConfig(), n_buckets=16
            )

        build_s = meter("index_build", one_build)
        lat = []
        for i in range(24):
            q = f"spark join window w{i}" if i % 2 else "data query filter"
            t0 = time.perf_counter()
            vectorized_topk(load_term_postings(spark, index, q), 10)
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()

        # distributed batch scoring: 32 queries as ONE Spark job over the
        # materialized index (the bulk-query throughput path, olaf_spark/batch)
        from olaf_spark.batch import batch_query_index

        batch = [
            (i, f"spark join window w{i}" if i % 2 else f"data query filter w{i}")
            for i in range(32)
        ]
        force(batch_query_index(spark, index, batch, k=10))  # plan warmup
        batch32_s = meter(
            "bm25_batch32", lambda: force(batch_query_index(spark, index, batch, k=10))
        )

        # B=1024: the broadcast subscription map amortizes over real batch
        # sizes — per-task cost must not grow with B (subs ride ONE
        # broadcast, not every task closure)
        batch_big = [
            (i, f"spark join window w{i % 200}" if i % 2 else f"data query filter w{i % 97}")
            for i in range(1024)
        ]
        batch1024_s = meter(
            "bm25_batch1024",
            lambda: force(batch_query_index(spark, index, batch_big, k=10)),
        )

        # delta-phase serving: append half the corpus as a delta and serve
        # through the group's idf-rescaled block-max path (incremental.py)
        from olaf_spark.incremental import IndexGroup, append_index
        from olaf_spark.indexer import build_index as _bi

        gdir = f"{tmp}/gix"
        _bi(spark, docs.where("doc_id % 2 = 0"), gdir, EngineConfig(), n_buckets=16)
        append_index(spark, docs.where("doc_id % 2 = 1"), gdir, n_buckets=16)
        group = IndexGroup.load(gdir)
        glat = []
        for i in range(24):
            q = f"spark join window w{i}" if i % 2 else "data query filter"
            t0 = time.perf_counter()
            group.topk(q, 10, method="blockmax")
            glat.append((time.perf_counter() - t0) * 1000)
        glat.sort()

        # positional + bigram side indexes, exact phrase serving
        # (olaf_spark.phrase / olaf_spark.bigram)
        from olaf_spark.bigram import build_bigrams
        from olaf_spark.phrase import build_positions, phrase_topk

        pdirs = iter(range(REPS))
        pdir = None

        def one_positions():
            nonlocal pdir
            pdir = f"{tmp}/pix{next(pdirs)}"
            build_positions(spark, docs, pdir, EngineConfig(), n_buckets=16)

        pos_build_s = meter("positions_build", one_positions)
        bigrams_build_s = meter(
            "bigrams_build",
            lambda: build_bigrams(spark, docs, pdir, EngineConfig(), n_buckets=16),
        )
        plat = []
        for _ in range(10):
            t0 = time.perf_counter()
            phrase_topk(pdir, "slow hash batch", k=10)
            plat.append((time.perf_counter() - t0) * 1000)
        plat.sort()

        # head-head phrase: BOTH terms corpus-frequent — round 3's worst
        # case. Served two ways: the bigram pair fast path (what serving
        # does now) and the positional ub-ordered scan (like-for-like with
        # rounds 3-4).
        hlat, hplat = [], []
        for _ in range(10):
            t0 = time.perf_counter()
            phrase_topk(pdir, "table hash", k=10)
            hlat.append((time.perf_counter() - t0) * 1000)
            t0 = time.perf_counter()
            phrase_topk(pdir, "table hash", k=10, use_bigrams=False)
            hplat.append((time.perf_counter() - t0) * 1000)
        hlat.sort()
        hplat.sort()

        # distributed batch phrase: 64 phrases as ONE Spark job
        from olaf_spark.phrase import batch_phrase_topk

        pool = ["slow hash batch", "table hash", "merge group", "part filter"]
        pbatch = [(i, pool[i % len(pool)]) for i in range(64)]
        force(batch_phrase_topk(spark, pdir, pbatch, k=10))  # plan warmup
        phrase_batch64_s = meter(
            "phrase_batch64",
            lambda: force(batch_phrase_topk(spark, pdir, pbatch, k=10)),
        )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.stop()

    total = METERS["headline_total"]["median"]
    out = {
        "metric": "olaf_spark headline query wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "cold_total_s": cold_total,
        "sf": sf,
        "n_docs": n_docs,
        "index_build_s": build_s,
        "index_docs_per_s": round(n_docs / build_s, 1) if build_s > 0 else None,
        "bm25_serve_p50_ms": round(lat[len(lat) // 2], 2),
        "bm25_serve_p95_ms": round(lat[int(len(lat) * 0.95)], 2),
        "bm25_batch32_s": batch32_s,
        "bm25_batch_queries_per_s": round(32 / batch32_s, 1) if batch32_s > 0 else None,
        "bm25_batch1024_s": batch1024_s,
        "bm25_batch1024_queries_per_s": round(1024 / batch1024_s, 1) if batch1024_s > 0 else None,
        "group_serve_p50_ms": round(glat[len(glat) // 2], 2),
        "group_serve_p95_ms": round(glat[int(len(glat) * 0.95)], 2),
        "positions_build_s": pos_build_s,
        "bigrams_build_s": bigrams_build_s,
        "phrase_serve_p50_ms": round(plat[len(plat) // 2], 2),
        "phrase_headhead_p50_ms": round(hlat[len(hlat) // 2], 2),
        "phrase_headhead_positional_p50_ms": round(hplat[len(hplat) // 2], 2),
        "phrase_batch64_s": phrase_batch64_s,
        "phrase_batch_queries_per_s": round(64 / phrase_batch64_s, 1) if phrase_batch64_s > 0 else None,
        "meters": METERS,
        "loadavg_start": loadavg_start,
        "loadavg_end": round(os.getloadavg()[0], 2),
        "parallelism": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
