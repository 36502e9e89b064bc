"""End-to-end spark-submit job scripts (jobs/build_index_job.py,
jobs/query_job.py) driven as subprocesses — the deployment surface the
north_rule requires ("runs via spark-submit --py-files"): build an index
from the html column of a pages table, query it, and check the results
against the library path."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from olaf_spark.synth import gen_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_build_and_query_jobs_end_to_end(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    gen_pages(spark, 200, seed=13).write.parquet(pages_dir)
    qfile = tmp_path / "q.txt"
    qfile.write_text("w1 w50 w1000\nneedle97\n")

    env = dict(os.environ, PYTHONPATH=REPO)
    ix_dir = str(tmp_path / "ix")
    r1 = subprocess.run(
        [sys.executable, f"{REPO}/jobs/build_index_job.py",
         "--pages", pages_dir, "--index", ix_dir, "--from-html", "--n-buckets", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    metrics = json.loads([l for l in r1.stdout.splitlines() if l.startswith("{")][0])
    assert metrics["n_docs"] == 200 and metrics["n_postings"] > 0

    r2 = subprocess.run(
        [sys.executable, f"{REPO}/jobs/query_job.py",
         "--index", ix_dir, "--queries", str(qfile), "--k", "5"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    rows = [json.loads(l) for l in r2.stdout.splitlines() if l.startswith("{")]
    assert rows and {"query_id", "rank", "doc_id", "score"} <= set(rows[0])
    # needle97 is planted in doc whose url-hash the job derived; the library
    # path over the job-built index must agree with the job's own output
    from olaf_spark.indexer import Index
    from olaf_spark.wand import query_index

    ix = Index.load(ix_dir)
    lib = query_index(spark, ix, "needle97", k=5)
    job = [(r["doc_id"], r["score"]) for r in rows if r["query_id"] == 1]
    assert [d for d, _ in lib] == [d for d, _ in job]

    # distributed batch path: one Spark job for the whole query file,
    # rank-identical to the driver-side scorer's output
    r3 = subprocess.run(
        [sys.executable, f"{REPO}/jobs/query_job.py",
         "--index", ix_dir, "--queries", str(qfile), "--k", "5",
         "--method", "distributed"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    drows = [json.loads(l) for l in r3.stdout.splitlines() if l.startswith("{")]
    dist = {}
    for r in sorted(drows, key=lambda r: (r["query_id"], r["rank"])):
        dist.setdefault(r["query_id"], []).append(r["doc_id"])
    serial = {}
    for r in rows:
        serial.setdefault(r["query_id"], []).append(r["doc_id"])
    assert dist == serial
