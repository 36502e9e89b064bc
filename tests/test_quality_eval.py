"""Retrieval-quality floors under seeded distortions.

The text analogue of Olaf's published evaluation ranges
(eval/README.md:110-123): the fuzzy ±searchRange path must recover
edit-distance-1 typo classes the exact path cannot, junk queries must
return nothing, and MinHash-LSH must recover lightly-perturbed near-dups.
All seeds fixed -> the table is deterministic; floors are intentionally
below the measured values so box noise never flakes them.
"""

from __future__ import annotations

import pytest

from olaf_spark.eval_quality import (
    ED1_CLASSES,
    distort_term,
    minhash_recall_eval,
    run_quality_eval,
)
from olaf_spark.indexer import build_index
from olaf_spark.synth import gen_pages

N_DOCS = 600  # >= 6 needle docs (every 97th)


@pytest.fixture(scope="module")
def quality(spark, tmp_path_factory):
    pages = gen_pages(spark, N_DOCS, seed=42).select("doc_id", "text").cache()
    rows = [(r["doc_id"], r["text"]) for r in pages.collect()]
    ix = build_index(
        spark, pages, str(tmp_path_factory.mktemp("q") / "ix"), n_buckets=4
    )
    return run_quality_eval(spark, ix, rows, n_typo_queries=6)


def test_distort_term_edit_distances():
    import random

    rng = random.Random(1)
    for term in ("needle97", "window", "w1234"):
        for mode in ED1_CLASSES:
            bad = distort_term(term, mode, rng)
            assert bad != term
        swapped = distort_term(term, "swap", rng)
        assert sorted(swapped) == sorted(term)  # transposition only
        doubled = distort_term(term, "double", rng)
        diff = [i for i in range(len(term)) if doubled[i] != term[i]]
        assert len(doubled) == len(term) and len(diff) == 2
        assert diff[1] - diff[0] >= 2  # can't collapse into one transposition


def test_fuzzy_recovers_damerau1_classes(quality):
    rows = {r["distortion"]: r for r in quality["typo_tpr"]}
    for mode in ED1_CLASSES:
        r = rows[mode]
        # the fuzzy path is BUILT for Damerau distance 1 — including the
        # swap class (round-5 transposition extension; TPR was 0.00 when
        # the ball was plain Levenshtein): high TPR, and never worse than
        # the exact path on the same distorted queries
        assert r["tpr_fuzzy"] >= 0.8, r
        assert r["tpr_fuzzy"] >= r["tpr_exact"], r
    assert rows["swap"]["tpr_fuzzy"] >= 0.9, rows["swap"]
    # the distance-2 double class is OUT of the ±1 range by design — it
    # must not silently score as if recovered (mirror of Olaf's
    # speed-distortion falloff, eval/README.md:110-123)
    assert rows["double"]["tpr_fuzzy"] <= 0.5, rows["double"]


def test_junk_queries_true_negative(quality):
    t = quality["tnr"]
    assert t["tnr_exact"] == 1.0, t
    assert t["tnr_fuzzy"] >= 0.9, t


def test_minhash_recall_floor(quality):
    rows = {r["perturb_rate"]: r["recall"] for r in quality["minhash_recall"]}
    assert rows[0.05] >= 0.9, rows
    assert rows[0.1] >= 0.8, rows


def test_eval_is_deterministic(spark):
    rows = [(i, f"w{i} w2 w3 common text body w{i + 1}") for i in range(40)]
    a = minhash_recall_eval(spark, rows, rates=(0.1,), seed=5)
    b = minhash_recall_eval(spark, rows, rates=(0.1,), seed=5)
    assert a == b
