"""Phrase serving benchmark at scale (default 400 k synthetic docs).

Measures the positional side index build, driver-side phrase serving
(selective / needle / head-head — the round-3 worst case), the WAND-style
ub-ordered early-termination evidence (n_decoded vs n_candidates), and the
distributed batch phrase path.

    python tools/phrase_bench.py [--n-docs 400000] [--cores 16] [--reps 5]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=400_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from olaf_spark.bigram import build_bigrams
    from olaf_spark.config import EngineConfig
    from olaf_spark.phrase import batch_phrase_topk, build_positions, phrase_topk
    from olaf_spark.session import get_spark
    from olaf_spark.synth import gen_pages

    spark = get_spark(args.cores, app_name="phrase_bench", shuffle_partitions=args.cores)
    pages = gen_pages(spark, args.n_docs, seed=42).select("doc_id", "text")

    out: dict = {"n_docs": args.n_docs, "cores": args.cores}
    with tempfile.TemporaryDirectory() as tmp:
        pdir = f"{tmp}/pix"
        t0 = time.perf_counter()
        build_positions(spark, pages, pdir, EngineConfig(), n_buckets=16)
        out["positions_build_s"] = round(time.perf_counter() - t0, 2)
        out["positions_docs_per_s"] = round(args.n_docs / out["positions_build_s"], 0)
        t0 = time.perf_counter()
        build_bigrams(spark, pages, pdir, EngineConfig(), n_buckets=16)
        out["bigrams_build_s"] = round(time.perf_counter() - t0, 2)
        bg_bytes = 0
        for root, _, files in os.walk(f"{pdir}/bigrams"):
            bg_bytes += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files if f.endswith(".parquet")
            )
        out["bigrams_bytes"] = bg_bytes

        queries = {
            "needle": "needle97",
            "selective": "w2 w12000",
            "headhead_2": "w2 w3",
            "headhead_3": "w2 w3 w5",
        }
        # phrase_{name}_ms = what serving does now (auto -> bigram units);
        # phrase_{name}_pos_ms = positional-only, like-for-like with the
        # round-4 records
        for name, q in queries.items():
            for suffix, use_bg in (("", None), ("_pos", False)):
                best = None
                stats: dict = {}
                for _ in range(args.reps):
                    st: dict = {}
                    t0 = time.perf_counter()
                    phrase_topk(pdir, q, k=10, _stats=st, use_bigrams=use_bg)
                    dt = (time.perf_counter() - t0) * 1000
                    if best is None or dt < best:
                        best, stats = dt, st
                out[f"phrase_{name}{suffix}_ms"] = round(best, 1)
                if stats:
                    out[f"phrase_{name}{suffix}_decoded"] = stats.get("n_decoded")
                    out[f"phrase_{name}{suffix}_candidates"] = stats.get(
                        "n_candidates"
                    )

        pool = ["w2 w3", "w2 w12000", "needle97", "w2 w3 w5"]
        pbatch = [(i, pool[i % len(pool)]) for i in range(64)]
        batch_phrase_topk(spark, pdir, pbatch, k=10).write.format("noop").mode(
            "overwrite"
        ).save()  # warm the plan shape
        t0 = time.perf_counter()
        batch_phrase_topk(spark, pdir, pbatch, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        out["phrase_batch64_s"] = round(time.perf_counter() - t0, 2)
        out["phrase_batch_qps"] = round(64 / out["phrase_batch64_s"], 1)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
