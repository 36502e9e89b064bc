"""Metadata filesystem seam (olaf_spark/metafs.py) — the contracts engine
logic relies on, tested against the POSIX implementation directly (the
engine-level behaviors built on them — delta claims, staging promotes,
tombstone races — are covered in test_incremental / test_index_wand /
test_jobs; these pin the primitives so an object-store backend can be
validated against the same suite)."""

from __future__ import annotations

import json
import os
import threading

from olaf_spark.metafs import PosixMetaFS, get_metafs


def test_claim_dir_exactly_one_winner(tmp_path):
    mfs = PosixMetaFS()
    target = str(tmp_path / "delta_0001")
    wins = []

    def claimer():
        if mfs.claim_dir(target):
            wins.append(1)

    threads = [threading.Thread(target=claimer) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert os.path.isdir(target)
    assert not mfs.claim_dir(target)  # a later claim still loses


def test_publish_json_overwrites_atomically(tmp_path):
    mfs = PosixMetaFS()
    p = str(tmp_path / "meta.json")
    mfs.publish_json(p, {"v": 1})
    mfs.publish_json(p, {"v": 2})
    with open(p) as f:
        assert json.load(f) == {"v": 2}
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]


def test_commit_file_and_publish_new(tmp_path):
    mfs = PosixMetaFS()
    final = str(tmp_path / "heads.parquet")
    tmp = mfs.tmp_path(final)
    # tmp siblings are dot-prefixed so parquet dataset readers skip strays
    assert os.path.basename(tmp).startswith(".")
    with open(tmp, "wb") as f:
        f.write(b"payload")
    mfs.commit_file(tmp, final)
    assert open(final, "rb").read() == b"payload"
    man = str(tmp_path / "lineage-abc.parquet")
    t2 = mfs.tmp_path(man)
    with open(t2, "wb") as f:
        f.write(b"m")
    mfs.publish_new(t2, man)
    assert os.path.exists(man) and not os.path.exists(t2)


def test_promote_dir_is_a_move(tmp_path):
    mfs = PosixMetaFS()
    src = tmp_path / "stage" / "tb=3"
    src.mkdir(parents=True)
    (src / "part-0.parquet").write_bytes(b"x")
    dst = tmp_path / "postings" / "tb=3"
    mfs.ensure_dir(str(tmp_path / "postings"))
    mfs.promote_dir(str(src), str(dst))
    assert (dst / "part-0.parquet").read_bytes() == b"x"
    assert not src.exists()


def test_exclusive_lock_serializes_and_cleans_up(tmp_path):
    mfs = PosixMetaFS()
    lock = str(tmp_path / "ts.lock")
    counter = {"n": 0, "max": 0, "cur": 0}
    guard = threading.Lock()

    def worker():
        for _ in range(20):
            with mfs.exclusive_lock(lock):
                with guard:
                    counter["cur"] += 1
                    counter["max"] = max(counter["max"], counter["cur"])
                counter["n"] += 1  # unsynchronized on purpose: lock protects
                with guard:
                    counter["cur"] -= 1

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert counter["max"] == 1  # never two holders at once
    assert counter["n"] == 80
    assert not os.path.exists(lock)


def test_exclusive_lock_takes_over_stale_lock(tmp_path):
    """A crashed holder's lock (old mtime, no process) is usurped after the
    lease, and the crashed holder's token can no longer release it."""
    mfs = PosixMetaFS()
    lock = str(tmp_path / "ts.lock")
    with open(lock, "w") as f:
        f.write("deadbeef")  # a holder that crashed
    os.utime(lock, (1, 1))  # ancient mtime -> lease expired
    entered = []
    with mfs.exclusive_lock(lock, lease_s=30.0):
        entered.append(1)
        # the usurper's fresh lock carries ITS token, not the crashed one
        assert open(lock).read() != "deadbeef"
    assert entered == [1]
    assert not os.path.exists(lock)


def test_get_metafs_is_process_wide_posix():
    assert isinstance(get_metafs(), PosixMetaFS)
