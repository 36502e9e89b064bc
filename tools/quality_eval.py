"""Retrieval-quality eval CLI: prints the TPR/TNR + recall tables.

The text analogue of Olaf's evaluation runs (`eval/olaf_evaluation.rb`,
expected ranges `eval/README.md:110-123`): seeded typo classes against the
exact and fuzzy serving paths, OOV true-negatives, and a MinHash-LSH
recall curve over token-perturbation rates. Deterministic for a given
(--n-docs, --seed); the current table is recorded in BENCH.md.

Usage: python tools/quality_eval.py [--n-docs 2000] [--seed 42]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from olaf_spark.eval_quality import run_quality_eval
    from olaf_spark.indexer import build_index
    from olaf_spark.session import get_spark
    from olaf_spark.synth import gen_pages

    spark = get_spark(args.cpus, app_name="quality_eval")
    pages = gen_pages(spark, args.n_docs, seed=args.seed).select("doc_id", "text").cache()
    pages_rows = [(r["doc_id"], r["text"]) for r in pages.collect()]
    ix_dir = tempfile.mkdtemp(prefix="quality_ix_") + "/ix"
    index = build_index(spark, pages, ix_dir, n_buckets=8)

    res = run_quality_eval(spark, index, pages_rows)

    print(f"\n## Retrieval quality (n_docs={args.n_docs}, seed={args.seed})\n")
    print("| distortion | ED | n | TPR exact | TPR fuzzy |")
    print("|---|---|---|---|---|")
    for r in res["typo_tpr"]:
        print(
            f"| {r['distortion']} | {r['edit_distance']} | {r['n_queries']} "
            f"| {r['tpr_exact']:.2f} | {r['tpr_fuzzy']:.2f} |"
        )
    t = res["tnr"]
    print(f"\nTNR (n={t['n_queries']}): exact {t['tnr_exact']:.2f}, fuzzy {t['tnr_fuzzy']:.2f}\n")
    print("| perturb rate | pairs | MinHash-LSH recall |")
    print("|---|---|---|")
    for r in res["minhash_recall"]:
        print(f"| {r['perturb_rate']} | {r['n_pairs']} | {r['recall']:.2f} |")
    print()
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
