"""Delta-phase serving bench: IndexGroup (main + delta) query latency,
full-decode referent vs idf-rescaled block-max pruning, plus compaction
wall. Run AFTER tools/scaling_bench.py has materialized the 400k corpus
(or pass --corpus).

    python tools/group_bench.py [--corpus /tmp/scaling_corpus_400000]
                                [--cores 16] [--min-score 8.0]

Prints one JSON line. The interesting number is blockmax vs vectorized on
THRESHOLDED queries — the round-3 claim is that the delta phase keeps its
lazy-decode pruning exactly when the index is biggest.
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
    ap.add_argument("--corpus", default="/tmp/scaling_corpus_400000")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--min-score", type=float, default=8.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from olaf_spark.config import EngineConfig
    from olaf_spark.incremental import IndexGroup, append_index, compact_index
    from olaf_spark.indexer import build_index
    from olaf_spark.session import get_spark, prewarm_python_workers

    spark = get_spark(args.cores, app_name="group_bench", shuffle_partitions=64)
    docs = spark.read.parquet(args.corpus)
    prewarm_python_workers(spark)

    queries = ["w2 w17 w300", "w2 w3 w5", "w100 w10000 w40000", "needle97 w2"]
    out: dict = {"n_docs": docs.count(), "cores": args.cores, "queries": {}}
    with tempfile.TemporaryDirectory() as tmp:
        base = os.path.join(tmp, "gix")
        t0 = time.perf_counter()
        build_index(spark, docs.where("doc_id % 2 = 0"), base, EngineConfig(), n_buckets=64)
        append_index(spark, docs.where("doc_id % 2 = 1"), base, n_buckets=64)
        out["build_plus_append_s"] = round(time.perf_counter() - t0, 2)
        group = IndexGroup.load(base)

        def best_ms(fn) -> float:
            ts = []
            for _ in range(args.reps):
                t = time.perf_counter()
                fn()
                ts.append((time.perf_counter() - t) * 1000)
            return round(min(ts), 1)

        for q in queries:
            stats: dict = {}
            row = {
                "vectorized_ms": best_ms(lambda: group.topk(q, 10, method="vectorized")),
                "blockmax_ms": best_ms(lambda: group.topk(q, 10, method="blockmax")),
                "blockmax_thresh_ms": best_ms(
                    lambda: group.topk(q, 10, method="blockmax", min_score=args.min_score)
                ),
                "vectorized_thresh_ms": best_ms(
                    lambda: group.topk(q, 10, method="vectorized", min_score=args.min_score)
                ),
            }
            group.topk(q, 10, method="blockmax", min_score=args.min_score, _prune_stats=stats)
            row["blocks_decoded_thresh"] = f"{stats.get('n_blocks_decoded')}/{stats.get('n_blocks_total')}"
            out["queries"][q] = row

        t0 = time.perf_counter()
        compacted = compact_index(spark, base, os.path.join(tmp, "cix"), n_groups=4)
        out["compact_wall_s"] = round(time.perf_counter() - t0, 2)
        out["compact_postings_per_s"] = round(compacted.stats["n_postings"] / max(out["compact_wall_s"], 1e-9))
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
