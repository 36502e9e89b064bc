"""Vector-ops micro-bench at synthetic scale (the sf tables' embeddings
stop at 2 k rows — too small to show index pruning): N clustered vectors,
brute-force vs LSH-probe vs IVF-probe serving p50, batch throughput, and
connected-components convergence on a planted pair graph.

    python tools/vector_bench.py [--n 200000] [--dim 64] [--cores 16]

Prints one JSON line per meter; results recorded in BENCH.md. Blobby
corpus (64 direction blobs) — the distribution IVF's learned cells are
FOR; the LSH layout is distribution-free. Both honest: recall@10 vs the
brute-force referent is printed next to each latency.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--queries", type=int, default=20)
    args = ap.parse_args()

    from olaf_spark.session import get_spark
    from olaf_spark.ops import similarity as sim

    spark = get_spark(parallelism=args.cores)

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((64, args.dim)) * 4.0
    t0 = time.time()
    ids = np.arange(args.n)
    pts = centers[ids % 64] + 0.3 * rng.standard_normal((args.n, args.dim))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(args.n)],
        "vec_id long, embedding array<double>",
    )
    corpus = tempfile.mkdtemp(prefix="vb_corpus_")
    emb.write.mode("overwrite").parquet(corpus)
    emb = spark.read.parquet(corpus)
    print(json.dumps({"meter": "synth", "n": args.n, "wall_s": round(time.time() - t0, 1)}))

    lsh_dir = tempfile.mkdtemp(prefix="vb_lsh_")
    t0 = time.time()
    sim.build_ann_index(spark, emb, lsh_dir, n_planes=8, seed=42)
    print(json.dumps({"meter": "lsh_build", "wall_s": round(time.time() - t0, 1)}))
    ivf_dir = tempfile.mkdtemp(prefix="vb_ivf_")
    t0 = time.time()
    sim.build_ivf_index(spark, emb, ivf_dir, n_centroids=64, sample_size=20_000, seed=42)
    print(json.dumps({"meter": "ivf_build", "wall_s": round(time.time() - t0, 1)}))

    qs = [[float(x) for x in centers[i % 64] + 0.3 * rng.standard_normal(args.dim)]
          for i in range(args.queries)]

    def p50(fn, label, referents=None):
        walls, recalls = [], []
        for i, q in enumerate(qs):
            t = time.time()
            got = [r["vec_id"] for r in fn(q).collect()]
            walls.append((time.time() - t) * 1000)
            if referents is not None:
                recalls.append(len(set(got) & set(referents[i])) / max(1, len(referents[i])))
        out = {"meter": label, "p50_ms": round(statistics.median(walls), 1),
               "best_ms": round(min(walls), 1)}
        if recalls:
            out["recall_at_10"] = round(statistics.mean(recalls), 3)
        print(json.dumps(out))
        return walls

    brute_results = []
    for q in qs:
        brute_results.append([r["vec_id"] for r in sim.cosine_topk(emb, q, k=10).collect()])
    p50(lambda q: sim.cosine_topk(emb, q, k=10), "brute_topk")
    p50(lambda q: sim.ann_topk_indexed(spark, lsh_dir, q, k=10, n_probes=3),
        "lsh_probe_topk", brute_results)
    p50(lambda q: sim.ann_ivf_topk(spark, ivf_dir, q, k=10, nprobe=4),
        "ivf_probe_topk", brute_results)

    # candidate-set sizes: the number each probe actually SCORES (the
    # scan-pruning number that scales; per-job latency above is mostly
    # local-mode job launch overhead at this corpus size)
    planes = sim.hyperplanes(args.dim, 8, 42)
    cands_lsh = statistics.mean(
        sim._ann_vector_scan(spark, lsh_dir, sim.probe_signatures(q, planes, 3)).count()
        for q in qs[:5]
    )
    meta = sim._ivf_meta(ivf_dir)
    cands_ivf = statistics.mean(
        sim._ivf_vector_scan(
            spark, ivf_dir,
            sim.ivf_probe_clusters(q, np.array(meta["centroids"]), 4),
        ).count()
        for q in qs[:5]
    )
    print(json.dumps({"meter": "candidates_scored", "corpus": args.n,
                      "lsh_3probe_mean": round(cands_lsh),
                      "ivf_4of64_mean": round(cands_ivf)}))

    batch = [(i, q) for i, q in enumerate(qs)]
    t0 = time.time()
    sim.ann_ivf_batch_topk(spark, ivf_dir, batch, k=10, nprobe=4).collect()
    w = time.time() - t0
    print(json.dumps({"meter": "ivf_batch", "b": len(batch),
                      "wall_s": round(w, 2), "q_per_s": round(len(batch) / w, 1)}))

    # connected components: 64 planted clique-chains + noise pairs
    from olaf_spark.ops.dedup import connected_components

    n_nodes = args.n
    chain = [(int(i), int(i + 64)) for i in range(n_nodes - 64)]  # 64 long chains
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    t0 = time.time()
    comp = connected_components(pairs, max_rounds=15)
    n_comp = comp.select("component").distinct().count()
    w = time.time() - t0
    print(json.dumps({"meter": "connected_components", "edges": len(chain),
                      "n_components": n_comp, "wall_s": round(w, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
