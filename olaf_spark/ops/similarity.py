"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k (broadcast the query vectors,
JVM-side zip_with/aggregate dot products). Scale path: LSH with
deterministic random-hyperplane signatures — bucket join generates
candidates, exact cosine verifies; recall is tested against brute force.

At 100 TB the brute-force path is a full scan per query batch (fine for
batch scoring: one scan serves B queries via the broadcast side); the LSH
path turns that into a bucket-key equi-join that Catalyst shuffles on
signature — candidates per query ~ corpus/2^bits, tunable.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(x * x for x in query_vec))
    v = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    sim = _dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qn))
    return (
        v.select("vec_id", F.round(sim, 6).cast("double").alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random unit hyperplanes (seeded, reproducible)."""
    rng = np.random.default_rng(seed)
    p = rng.standard_normal((n_planes, dim))
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Column: bit-string signature (sign of dot with each plane)."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec_col, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates from the query's LSH bucket (plus the
    `n_probes-1` nearest buckets by Hamming distance via single-bit flips),
    exact cosine on candidates only.

    The signature filter is a pushdown-able IN-list; with the corpus stored
    partitioned by signature prefix, a probe reads only matching partitions.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig_bits = (planes @ qv >= 0).astype(int)
    sigs = ["".join(map(str, qsig_bits))]
    # multi-probe: flip the bits whose |dot| margin is smallest first
    margins = np.abs(planes @ qv)
    for j in np.argsort(margins)[: max(0, n_probes - 1)]:
        flipped = qsig_bits.copy()
        flipped[j] ^= 1
        sigs.append("".join(map(str, flipped)))

    v = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    v = v.withColumn("sig", lsh_signature_col(F.col("v"), planes))
    cand = v.where(F.col("sig").isin(sigs))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(float(qv @ qv))
    sim = _dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qn))
    return (
        cand.select("vec_id", F.round(sim, 6).cast("double").alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def batch_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k per query for a batch: broadcast queries, one corpus scan.

    (query_id, vec_id, cosine_sim, rank) — rank via per-query window over the
    per-partition top-k survivors.
    """
    from pyspark.sql import Window

    v = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(
        F.col(q_id_col).alias("query_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    )
    sim = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", F.round(sim, 6).cast("double").alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )
