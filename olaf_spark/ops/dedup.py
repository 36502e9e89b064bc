"""Deduplication operators: exact, n-gram Jaccard, MinHash(+LSH), SimHash,
embedding-cosine near-dup.

Reference analogue: Olaf's dedup command queries every stored file against
the index and filters self-matches (`cli/olaf_cli_cmd_dedup.zig:22-70`,
README.md:245-257) — a semantic self-join through the index. Here the
same shape for text: candidate generation through an inverted structure
(shared shingles / LSH buckets) followed by pair verification, never an
all-pairs cross join.

Scale notes:
  * candidate self-joins are on (shingle/band) keys — ultra-common keys are
    the skew hazard, so shingle-df capping (`max_shingle_df`) drops
    non-discriminative shingles before the join (a *correct* version of
    Olaf's maxDBCollisions cap: dropping a shingle can only lose candidate
    pairs that other, rarer shared shingles still produce; the cap is an
    explicit recall knob, default 10_000 — see ngram_jaccard_pairs).
  * all hashes are md5 (deterministic, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olaf_spark.config import EngineConfig
from olaf_spark.tokenize import tokens_array

_DEFAULT = EngineConfig()


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_copies, keep_doc_id) — exact dedup by content hash."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min(id_col).cast("long").alias("keep_doc_id"),
        )
    )


def shingles_array(text_col, n: int = 3, cfg: EngineConfig = _DEFAULT):
    """Column: distinct word n-gram shingles of the tokenized text (JVM-side)."""
    toks = tokens_array(text_col, cfg)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def doc_shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_id, shingle) — one row per distinct shingle per doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_array(F.col(text_col), n, cfg)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard >= threshold.

    Candidates come from the shingle self-join (docs sharing >=1 shingle);
    |A| and |B| from per-doc shingle counts; |A∩B| from the pair group count.

    max_shingle_df (default 10_000) drops shingles shared by more docs than
    the cap BEFORE the self-join — one Zipfy boilerplate shingle with df=D
    otherwise contributes ~D^2/2 candidate rows (5*10^7 at the default cap,
    unbounded without it). Recall argument for the default: a shingle
    common to >10k documents is non-discriminative — it cannot separate
    near-dup pairs inside a 10k+-doc cohort that all share it — and a TRUE
    near-dup pair at threshold t shares >= t/(1+t) of its union shingles,
    so losing it only loses a pair whose EVERY shared shingle is that
    common, i.e. pure boilerplate twins, which exact/MinHash dedup catches
    without a join. Jaccard is then computed over the capped shingle sets
    on both sides (|A|, |B| and the intersection all post-cap), so scores
    stay internally consistent. None disables the cap (exactness referent).
    """
    sh = doc_shingles(docs, n, text_col, id_col, cfg)
    if max_shingle_df is not None:
        counts = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        sh = sh.join(counts.where(F.col("sdf") <= max_shingle_df), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6
            ).cast("double").alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}) — MinHash over md5('<seed>|'||shingle).

    One shuffle: explode shingles then n_hashes min() aggregates in a single
    groupBy pass (map-side partial mins keep the shuffle tiny).
    """
    sh = doc_shingles(docs, n, text_col, id_col, cfg)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh_{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_a, doc_b, n_bands) — candidate near-dup pairs agreeing on >=1
    LSH band (band hash = md5 of its minhashes concatenated)."""
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes, n, text_col, id_col, cfg)
    band_cols = []
    for bi in range(bands):
        cols = [F.col(f"mh_{bi * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(bi).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bh"))
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_bands"))
    )


# ---------------------------------------------------------------- SimHash

_HEX_CASE = "CASE {c} " + " ".join(
    f"WHEN '{d}' THEN {int(d, 16)}" for d in "0123456789abcdef"
) + " ELSE 0 END"


def _hex_digit_sql(col_sql: str, pos: int) -> str:
    """Portable SQL: value of hex digit `pos` (1-based) of an md5 hex string."""
    return _HEX_CASE.format(c=f"substr({col_sql}, {pos}, 1)")


def simhash_bit_sql(term_sql: str, bit: int) -> str:
    """Portable SQL for bit `bit` (0..31) of md5(term): digit bit//4, bit bit%4.

    floor-div + mod instead of shift operators (identical in Spark SQL and
    DuckDB; `>>`/`&` precedence and typing differ between them).
    """
    digit = _hex_digit_sql(f"md5({term_sql})", bit // 4 + 1)
    return f"(CAST(floor(({digit}) / {2 ** (bit % 4)}) AS BIGINT) % 2)"


def simhash_expr_sql(term_sql: str, tf_sql: str, bits: int = 32) -> list[str]:
    """Per-bit signed contribution exprs: tf * (2*bit - 1)."""
    return [
        f"({tf_sql}) * (2 * ({simhash_bit_sql(term_sql, j)}) - 1)"
        for j in range(bits)
    ]


def simhash_df(
    tf_df: DataFrame,
    bits: int = 32,
) -> DataFrame:
    """(doc_id, simhash) from a (doc_id, term, tf) DataFrame.

    The identical expression strings run in DuckDB, so oracle checks are
    exact. 32 bits = 8 md5 hex digits; weight = tf.
    """
    contribs = simhash_expr_sql("term", "tf", bits)
    aggs = [F.sum(F.expr(c)).alias(f"s_{j}") for j, c in enumerate(contribs)]
    per_doc = tf_df.groupBy("doc_id").agg(*aggs)
    val = F.lit(0).cast("long")
    for j in range(bits):
        val = val + F.when(F.col(f"s_{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0))
    return per_doc.select("doc_id", val.alias("simhash"))


def simhash_sql(tok_cte: str, bits: int = 32) -> str:
    """DuckDB twin of simhash_df, given a tf CTE named `tf(doc_id, term, tf)`."""
    contribs = simhash_expr_sql("term", "tf", bits)
    sums = ", ".join(f"sum({c}) AS s_{j}" for j, c in enumerate(contribs))
    val = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)" for j in range(bits)
    )
    return f"""
WITH {tok_cte}
, per_doc AS (SELECT doc_id, {sums} FROM tf GROUP BY doc_id)
SELECT doc_id, ({val})::BIGINT AS simhash FROM per_doc
"""


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 30,
) -> DataFrame:
    """(node, component) — component = MIN node id in each connected
    component of the undirected pair graph.

    Pair emitters (exact / n-gram / MinHash-LSH / SimHash / embedding-LSH)
    stop at EDGES; a dedup pipeline needs GROUPS — near-dup relations are
    not transitive pairwise, so "keep one doc per component" is the
    standard closure (the reference's dedup likewise groups per matched
    store track before reporting, `cli/olaf_cli_cmd_dedup.zig:22-70`).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14). Each
    half-step is one groupBy(node) shuffle + one equi-join on node —
    no all-pairs work, no driver-side graph — and the edge set converges
    to star graphs centered on the component minimum in O(log^2 n)
    rounds. Label propagation would need O(diameter) rounds (a 100 TB
    near-dup chain can be arbitrarily long); this is the scale-safe
    choice. Every round `localCheckpoint`s the edge list to cut the
    iterative lineage (the standard Spark iterative-algorithm move),
    and convergence is detected with an order-independent signature
    aggregate (count + bit_xor of xxhash64(u,v)): bit_xor cannot
    overflow under ANSI arithmetic and never false-stops in practice;
    a collision would need two DISTINCT edge sets of equal size with
    equal 64-bit xor.

    Nodes that appear in no pair are absent from the output (they are
    their own singleton components — callers left-join + coalesce).
    """
    E = (
        pairs.select(
            F.col(a_col).cast("long").alias("u"),
            F.col(b_col).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # checkpoint the INPUT edges first: the upstream pair emitter may be
    # the most expensive plan in the whole closure (an LSH band self-join
    # over the corpus), and without this it would re-execute for
    # isEmpty, for nodes, and twice inside round 1's sym union
    E = E.localCheckpoint(eager=True)
    if E.isEmpty():
        return E.select(F.col("u").alias("node"), F.col("v").alias("component"))
    nodes = E.select("u").union(E.select("v")).distinct().select(F.col("u").alias("node"))
    nodes = nodes.localCheckpoint(eager=True)

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("x"),
        ).collect()[0]
        return (row["n"], row["x"])

    prev_sig = prev2 = None
    for _ in range(max_rounds):
        # large-star: every node attaches its strictly-LARGER neighbors to
        # the minimum of its closed neighborhood -> all edges point down
        sym = E.union(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        E = (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: every node attaches its smaller-or-equal neighbors
        # AND itself to the minimum of that set (all edges already point
        # down after large-star, so this sees every edge)
        mins2 = (
            E.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        E = (
            E.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        E = E.localCheckpoint(eager=True)
        sig = _sig(E)
        if sig == prev_sig:
            break
        prev2, prev_sig = prev_sig, sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"(edge signature still changing: {prev2} -> {prev_sig})"
        )
    # converged: E is star edges (child -> component root); roots have no
    # outgoing edge, so label = coalesce(star target, self)
    return nodes.join(E, nodes["node"] == E["u"], "left").select(
        "node", F.coalesce(F.col("v"), F.col("node")).alias("component")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine_sim) for pairs with cosine >= threshold.

    Brute-force self-join baseline — the EXACTNESS REFERENT only (O(n^2)
    candidate rows; never run this at scale). The scale path is
    olaf_spark.ops.similarity.embedding_near_dup_pairs_lsh: LSH-band
    bucket-join candidates + exact cosine verify, recall-tested against
    this function (tests/test_ops.py).
    """
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    norm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    v = v.withColumn("nrm", norm)
    a = v.alias("a")
    b = v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).cast("double").alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
