"""Retrieval-quality evaluation under seeded distortions (TPR/TNR tables).

Reference analogue: Olaf's evaluation harness runs the engine over
sox-distorted query fragments and reports per-distortion TPR/TNR
(`eval/olaf_evaluation.rb:266-346`), with expected ranges published in
`eval/README.md:110-123`. The text analogue evaluated here:

  * typo classes stand in for the audio distortions — swap (adjacent
    transposition: Damerau distance 1, text's most common typo class),
    drop / insert / keyboard-adjacent substitute (each distance 1), and
    double (two independent substitutions — true distance 2);
  * TPR = a distorted query still retrieves its source document in the
    top-k, measured for BOTH the exact serving path (wand.query_index)
    and the fuzzy ±searchRange analogue (fuzzy.fuzzy_query_index) —
    the fuzzy probe's Damerau ball recovers swap AND the ED-1 classes,
    and, like Olaf under out-of-range distortions (speed ±10%), must NOT
    recover the distance-2 double class;
  * TNR = out-of-vocabulary junk queries return nothing on either path;
  * MinHash-LSH pair recall vs token-perturbation rate plays the role of
    the degradation curve across distortion strengths.

Everything is seeded and deterministic: the same (corpus seed, eval seed)
reproduces the same table. Floors are asserted in
tests/test_quality_eval.py; the full table is printed by
tools/quality_eval.py and recorded in BENCH.md.
"""

from __future__ import annotations

import random

from pyspark.sql import SparkSession

from olaf_spark.fuzzy import ALPHABET, fuzzy_query_index
from olaf_spark.indexer import Index
from olaf_spark.synth import NEEDLE_EVERY
from olaf_spark.wand import query_index

# classes the fuzzy probe is DESIGNED to recover (all Damerau distance 1 —
# swap joined in round 5 when the ball grew transpositions), plus the
# distance-2 double class it is designed NOT to (the out-of-range referent,
# Olaf's speed ±10% falloff analogue)
ED1_CLASSES = ("swap", "drop", "insert", "keyboard")
OUT_OF_RANGE_CLASSES = ("double",)
ALL_CLASSES = ED1_CLASSES + OUT_OF_RANGE_CLASSES

_KEYBOARD_ROWS = ("qwertyuiop", "asdfghjkl", "zxcvbnm", "0123456789")


def _keyboard_neighbors(c: str) -> str:
    for row in _KEYBOARD_ROWS:
        i = row.find(c)
        if i >= 0:
            return row[max(0, i - 1):i] + row[i + 1:i + 2]
    return ""


def distort_term(term: str, mode: str, rng: random.Random) -> str:
    """One seeded typo of the given class. swap/drop/insert/keyboard are
    Damerau distance 1; double is two keyboard substitutions at positions
    >= 2 apart — exactly distance 2 (non-adjacent, so the pair can never
    collapse into a single transposition)."""
    if mode == "swap":
        spots = [i for i in range(len(term) - 1) if term[i] != term[i + 1]]
        if not spots:
            return term
        i = rng.choice(spots)
        return term[:i] + term[i + 1] + term[i] + term[i + 2:]
    if mode == "double":
        if len(term) < 3:
            return term
        i = rng.randrange(len(term) - 2)
        js = range(i + 2, len(term))
        j = rng.choice(list(js))
        out = term
        for p in (j, i):  # right-to-left so indices stay valid
            nbrs = _keyboard_neighbors(out[p]) or ALPHABET
            c = rng.choice([x for x in nbrs if x != out[p]] or list(ALPHABET))
            out = out[:p] + c + out[p + 1:]
        return out
    if mode == "drop":
        if len(term) < 2:
            return term
        i = rng.randrange(len(term))
        return term[:i] + term[i + 1:]
    if mode == "insert":
        i = rng.randrange(len(term) + 1)
        return term[:i] + rng.choice(ALPHABET) + term[i:]
    if mode == "keyboard":
        i = rng.randrange(len(term))
        nbrs = _keyboard_neighbors(term[i]) or ALPHABET
        c = rng.choice([x for x in nbrs if x != term[i]] or list(ALPHABET))
        return term[:i] + c + term[i + 1:]
    raise ValueError(f"unknown distortion class {mode!r}")


def typo_tpr_eval(
    spark: SparkSession,
    index: Index,
    needle_doc_ids: list[int],
    classes: tuple[str, ...] = ALL_CLASSES,
    k: int = 10,
    seed: int = 7,
) -> list[dict]:
    """Per-distortion-class TPR: does the distorted needle query still
    retrieve its source doc in the top-k? One row per class, exact vs
    fuzzy side by side (Olaf's per-modification result table)."""
    rows = []
    for mode in classes:
        # string seeding is sha512-based — deterministic across processes
        # (a tuple hash would be PYTHONHASHSEED-randomized)
        rng = random.Random(f"{seed}|{mode}")
        n = hit_exact = hit_fuzzy = 0
        for doc_id in needle_doc_ids:
            term = f"needle{doc_id}"
            bad = distort_term(term, mode, rng)
            n += 1
            got = query_index(spark, index, bad, k=k)
            hit_exact += any(d == doc_id for d, _ in got)
            fz = fuzzy_query_index(spark, index, bad, k=k)
            hit_fuzzy += any(d == doc_id for d, _ in fz)
        rows.append(
            dict(
                distortion=mode,
                # Damerau (OSA) distance — what the fuzzy ball is built on
                edit_distance=2 if mode == "double" else 1,
                n_queries=n,
                tpr_exact=hit_exact / n if n else 0.0,
                tpr_fuzzy=hit_fuzzy / n if n else 0.0,
            )
        )
    return rows


_JUNK_ALPHABET = "qzxjvk"  # chars rare in the synthetic vocabulary


def tnr_eval(
    spark: SparkSession,
    index: Index,
    n_queries: int = 20,
    k: int = 10,
    seed: int = 11,
) -> dict:
    """True-negative rate: out-of-vocabulary junk queries must return
    NOTHING — on the exact path (term absent -> no postings) and on the
    fuzzy path (the whole ED-1 ball absent)."""
    rng = random.Random(seed)
    n = tn_exact = tn_fuzzy = 0
    for _ in range(n_queries):
        junk = "".join(rng.choice(_JUNK_ALPHABET) for _ in range(10))
        n += 1
        tn_exact += not query_index(spark, index, junk, k=k)
        tn_fuzzy += not fuzzy_query_index(spark, index, junk, k=k)
    return dict(
        n_queries=n,
        tnr_exact=tn_exact / n if n else 0.0,
        tnr_fuzzy=tn_fuzzy / n if n else 0.0,
    )


def _perturb_text(text: str, rate: float, rng: random.Random) -> str:
    toks = text.split(" ")
    n_swap = max(1, int(len(toks) * rate))
    for j in rng.sample(range(len(toks)), min(n_swap, len(toks))):
        toks[j] = "zznoise" + str(rng.randrange(10_000))
    return " ".join(toks)


def minhash_recall_eval(
    spark: SparkSession,
    doc_rows: list[tuple[int, str]],
    rates: tuple[float, ...] = (0.05, 0.1, 0.2, 0.3),
    n_hashes: int = 16,
    bands: int = 8,
    seed: int = 13,
) -> list[dict]:
    """MinHash-LSH pair recall vs token-perturbation rate: for each rate,
    plant one perturbed copy per sampled doc and measure how many
    (original, copy) pairs the banded candidate join recovers — the
    degradation-curve analogue of Olaf's distortion-strength sweep."""
    from olaf_spark.ops.dedup import minhash_lsh_pairs

    offset = 1 + max(d for d, _ in doc_rows)
    out = []
    for rate in rates:
        rng = random.Random(f"{seed}|{rate}")
        planted = [(d + offset, _perturb_text(t, rate, rng)) for d, t in doc_rows]
        df = spark.createDataFrame(doc_rows + planted, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(df, n_hashes=n_hashes, bands=bands).collect()
        }
        expected = {(d, d + offset) for d, _ in doc_rows}
        recall = len(got & expected) / len(expected) if expected else 0.0
        out.append(
            dict(
                perturb_rate=rate,
                n_pairs=len(expected),
                recall=round(recall, 4),
                n_candidates=len(got),
            )
        )
    return out


def run_quality_eval(
    spark: SparkSession,
    index: Index,
    pages_rows: list[tuple[int, str]],
    n_typo_queries: int = 20,
    seed: int = 7,
) -> dict:
    """Full table: typo TPR per class + TNR + MinHash recall curve."""
    needles = sorted(d for d, _ in pages_rows if d % NEEDLE_EVERY == 0)[:n_typo_queries]
    sample = [r for r in pages_rows if r[0] % 17 == 3][:24]
    return dict(
        typo_tpr=typo_tpr_eval(spark, index, needles, seed=seed),
        tnr=tnr_eval(spark, index, seed=seed + 1),
        minhash_recall=minhash_recall_eval(spark, sample, seed=seed + 2),
    )
