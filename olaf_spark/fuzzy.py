"""Fuzzy term lookup — the text analogue of Olaf's ±searchRange probe.

Reference: Olaf widens each query hash into a CONTIGUOUS B+tree range scan
(`src/olaf_db.c:337-398`, config searchRange `olaf_config.c:86-87`) because
its quantized fingerprint hashes preserve neighborhood — near-identical
audio lands on adjacent keys. xxhash64(term) preserves nothing, so the same
capability re-expresses as a GENERATED-NEIGHBOR probe: expand the query
term to every string within Damerau-Levenshtein (OSA) distance 1 over the
tokenizer's alphabet, hash each variant, and probe the term-sorted index
with one `term_id IN (...)` predicate — the identical access shape (a
handful of point/range reads against sorted storage, pushed down to the
scan), with the neighborhood computed up front instead of implied by key
order.

The ball is DAMERAU (ins + del + sub + ADJACENT TRANSPOSITION), not plain
Levenshtein: Olaf's ±searchRange exists to tolerate its store's most
common quantization error class, and the most common typo class in text
is the adjacent swap ("teh") — Levenshtein counts it as 2 and would miss
it. At distance <= 1 the OSA and unrestricted-Damerau balls coincide, so
the DuckDB oracle can state the same set declaratively
(damerau_levenshtein(term, probe) <= 1) and the driver verifies the
generated neighborhood IS that ball.

Cost at scale: a length-L term has ~37L+36(L+1)+(L-1)+L+1 variants (del +
sub + ins + transposition + self over [a-z0-9]); ~700 ids for L=9. The
probe prunes by hive shard + row-group stats exactly like an exact-term
query — no vocabulary scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def edit1_variants(term: str) -> set[str]:
    """All non-empty strings within Damerau-Levenshtein (OSA) distance <= 1
    of `term` over the tokenizer alphabet [a-z0-9]: deletions,
    substitutions, insertions, ADJACENT TRANSPOSITIONS, and the term
    itself. (At distance 1, OSA == unrestricted Damerau.)"""
    out = {term}
    for i in range(len(term)):
        out.add(term[:i] + term[i + 1:])                       # deletion
        for c in ALPHABET:
            out.add(term[:i] + c + term[i + 1:])               # substitution
    for i in range(len(term) + 1):
        for c in ALPHABET:
            out.add(term[:i] + c + term[i:])                   # insertion
    for i in range(len(term) - 1):                             # transposition
        out.add(term[:i] + term[i + 1] + term[i] + term[i + 2:])
    out.discard("")
    return out


def fuzzy_term_stats(term_stats: DataFrame, probe: str) -> DataFrame:
    """(term, df) of every indexed term within edit distance 1 of `probe`.

    term_stats: (term, df). The isin predicate pushes down to the scan —
    with term-sorted storage this reads a bounded set of row groups, never
    the vocabulary (olaf_db_find's ±range scan, re-expressed).
    """
    variants = sorted(edit1_variants(probe))
    return term_stats.where(F.col("term").isin(variants)).select("term", "df")


def fuzzy_query_index(spark, index, probe: str, k: int = 10) -> list[tuple[int, float]]:
    """Fuzzy BM25 top-k against a MATERIALIZED index: the edit-distance-1
    neighborhood probes the posting store as one variant-id isin (hive
    shard pruning + row-group stats — the ±range scan's access pattern);
    variants present in the index score as ordinary query terms.

    Implementation: the variant set IS a query string — the serving loader
    tokenizes it back into the variants, hashes each, and probes; absent
    variants simply match no posting rows.
    """
    from olaf_spark.wand import load_term_postings, vectorized_topk

    variants = sorted(edit1_variants(probe))
    lists = load_term_postings(spark, index, " ".join(variants))
    return vectorized_topk(lists, k)


def fuzzy_query_terms(
    term_stats: DataFrame, n_docs: int, probe: str
) -> list[tuple[str, float]]:
    """[(term, idf)] for every indexed edit-distance-1 neighbor of probe,
    ascending term order — drop-in for scorer.query_term_idfs, so the
    fuzzy query scores through the ordinary BM25 pipeline (each matched
    variant contributes with its own df/idf, OR semantics — Olaf tallies
    every hash in the widened range the same way)."""
    from olaf_spark.scorer import idf

    rows = fuzzy_term_stats(term_stats, probe).collect()
    return sorted((r["term"], idf(n_docs, int(r["df"]))) for r in rows)
