"""spark-submit entry point: ANN vector index — build, append,
delete/undelete, compact, batch query — over either layout:

  --layout lsh (default)  data-independent hyperplane signatures
  --layout ivf            learned spherical-k-means cells (build takes
                          --n-centroids/--sample-size; query's --n-probes
                          means nprobe cells)

    spark-submit --py-files /tmp/olaf_spark.zip jobs/ann_job.py \
        build   --embeddings s3://bucket/emb/ --index /mnt/shared/ann/v1 \
                [--layout lsh --n-planes 8 | --layout ivf --n-centroids 64] [--seed 42]
    spark-submit ... ann_job.py append  --embeddings ... --index /mnt/shared/ann/v1 [--layout ivf]
    spark-submit ... ann_job.py delete   --index ... --vec-ids 1,2,3
    spark-submit ... ann_job.py undelete --index ... --vec-ids 1,2,3
    spark-submit ... ann_job.py compact --index /mnt/shared/ann/v1 --out /mnt/shared/ann/v2 [--layout ivf]
    spark-submit ... ann_job.py query   --index ... --queries q.parquet \
                [--layout ivf] [--k 10] [--n-probes 3] [--out results/]

delete/undelete are layout-agnostic (tombstones.json at the index root,
shared by both layouts). --index / --out must live on a local or shared
POSIX filesystem (same constraint as jobs/maintain_job.py — the delta
claim and commit markers are driver-side POSIX operations);
--embeddings / --queries are read through Spark and may be any
Hadoop-supported URI.

queries parquet: (query_id long, embedding array<float|double>). Results:
(query_id, vec_id, cosine_sim, rank) — one Spark job for the whole batch
(ann_batch_topk_indexed / ann_ivf_batch_topk), written as parquet with
--out, else JSON lines.

Each subcommand prints one JSON metrics line (the store-summary analogue,
cli/olaf_cli_bridge.zig:139-216).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def _written_rows(d: str) -> int:
    """Row count of a written vectors/ layout from parquet FOOTERS only —
    no second scan of the (possibly remote, possibly huge) source input
    just to print a metrics line."""
    import os

    import pyarrow.dataset as ds

    return ds.dataset(
        os.path.join(d, "vectors"), format="parquet", partitioning="hive"
    ).count_rows()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_b = sub.add_parser("build")
    p_b.add_argument("--embeddings", required=True)
    p_b.add_argument("--index", required=True)
    p_b.add_argument("--layout", choices=("lsh", "ivf"), default="lsh")
    p_b.add_argument("--n-planes", type=int, default=8)
    p_b.add_argument("--n-centroids", type=int, default=16)
    p_b.add_argument("--sample-size", type=int, default=20_000)
    p_b.add_argument("--seed", type=int, default=42)

    p_a = sub.add_parser("append")
    p_a.add_argument("--embeddings", required=True)
    p_a.add_argument("--index", required=True)
    p_a.add_argument("--layout", choices=("lsh", "ivf"), default="lsh")

    for name in ("delete", "undelete"):
        p = sub.add_parser(name)
        p.add_argument("--index", required=True)
        p.add_argument("--vec-ids", required=True, help="comma-separated vector ids")

    p_c = sub.add_parser("compact")
    p_c.add_argument("--index", required=True)
    p_c.add_argument("--out", required=True)
    p_c.add_argument("--layout", choices=("lsh", "ivf"), default="lsh")

    p_q = sub.add_parser("query")
    p_q.add_argument("--index", required=True)
    p_q.add_argument("--queries", required=True,
                     help="parquet of (query_id, embedding)")
    p_q.add_argument("--layout", choices=("lsh", "ivf"), default="lsh")
    p_q.add_argument("--k", type=int, default=10)
    p_q.add_argument("--n-probes", type=int, default=3)
    p_q.add_argument("--out", default=None)
    args = ap.parse_args()

    from olaf_spark.ops import similarity as sim

    spark = SparkSession.builder.appName(f"olaf_spark_ann_{args.cmd}").getOrCreate()
    t0 = time.time()

    if args.cmd == "build":
        emb = spark.read.parquet(args.embeddings)
        if args.layout == "ivf":
            sim.build_ivf_index(
                spark, emb, args.index, n_centroids=args.n_centroids,
                sample_size=args.sample_size, seed=args.seed,
            )
        else:
            sim.build_ann_index(
                spark, emb, args.index, n_planes=args.n_planes, seed=args.seed
            )
        print(json.dumps({
            "cmd": "build", "layout": args.layout, "index": args.index,
            "n_vectors": _written_rows(args.index),
            "wall_s": round(time.time() - t0, 2),
        }))
    elif args.cmd == "append":
        emb = spark.read.parquet(args.embeddings)
        fn = sim.append_ivf_index if args.layout == "ivf" else sim.append_ann_index
        delta = fn(spark, emb, args.index)
        print(json.dumps({
            "cmd": "append", "layout": args.layout, "delta_dir": delta,
            "n_vectors": _written_rows(delta),
            "wall_s": round(time.time() - t0, 2),
        }))
    elif args.cmd in ("delete", "undelete"):
        ids = [int(x) for x in args.vec_ids.split(",") if x.strip()]
        (sim.delete_vectors if args.cmd == "delete" else sim.undelete_vectors)(
            args.index, ids
        )
        print(json.dumps({
            "cmd": args.cmd, "n_vec_ids": len(ids),
            "tombstones_now": len(sim.ann_tombstones(args.index)),
        }))
    elif args.cmd == "compact":
        fn = sim.compact_ivf_index if args.layout == "ivf" else sim.compact_ann_index
        fn(spark, args.index, args.out)
        print(json.dumps({
            "cmd": "compact", "layout": args.layout, "out": args.out,
            "wall_s": round(time.time() - t0, 2),
        }))
    else:  # query
        q = spark.read.parquet(args.queries)
        queries = [
            (int(r["query_id"]), [float(x) for x in r["embedding"]])
            for r in q.collect()
        ]
        if args.layout == "ivf":
            out_df = sim.ann_ivf_batch_topk(
                spark, args.index, queries, k=args.k, nprobe=args.n_probes
            )
        else:
            out_df = sim.ann_batch_topk_indexed(
                spark, args.index, queries, k=args.k, n_probes=args.n_probes
            )
        if args.out:
            out_df.write.mode("overwrite").parquet(args.out)
        else:
            for r in out_df.orderBy("query_id", "rank").collect():
                print(json.dumps(r.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
