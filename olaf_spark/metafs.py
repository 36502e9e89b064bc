"""Metadata filesystem seam — every MUTATING filesystem primitive the
engine's maintenance plane relies on, behind one small interface.

Why a seam: the query path reads committed parquet through Spark/pyarrow
(any Hadoop-compatible URI works), but the MAINTENANCE plane — delta
claims, compaction staging promotes, commit-marker metas, the tombstone
lock — leans on POSIX atomicity (mkdir, rename, O_EXCL). A 100 TB
deployment lives on S3/GCS, where these need different mechanics
(conditional PUT / If-None-Match for claims, a commit log or DynamoDB-style
mutex for the lock, copy+list for promotes — the commit-protocol plane
Iceberg/Delta put in a catalog; the reference's analogue is LMDB's
single-writer env, olaf_db.c:28-37, which Spark deployments replace with
object-store-native commit protocols). Engine logic therefore never calls
os.mkdir/os.rename/os.replace/open-for-write on index paths directly: it
states WHAT commit semantic it needs through this interface, and swapping
`set_metafs(...)` for an object-store implementation touches nothing else.

Atomicity contract per op (what any implementation MUST provide):

  ensure_dir(path)        idempotent create; no atomicity requirement.
  claim_dir(path)         EXACTLY ONE of N concurrent claimers returns
                          True; the claim is durable and visible before
                          any data lands under it. (POSIX: mkdir;
                          object store: conditional PUT of a claim key.)
  promote_dir(src, dst)   all-or-nothing move of a finished staging dir;
                          readers never observe a partial dst. dst must
                          not exist. (POSIX: rename — same filesystem;
                          object store: manifest swap, not object copy.)
  remove_dir(path)        recursive delete of a dir this engine owns:
                          crashed uncommitted partials, or a committed
                          tree being INTENTIONALLY replaced (rebuild /
                          non-resume build) — a backend must support both.
  remove_file(path)       retract one committed file (commit-marker
                          invalidation before a rebuild).
  publish_json/bytes      whole-file commit with overwrite: readers see
                          the old content or the new, never a prefix, and
                          a crash mid-publish leaves the old file intact.
                          (POSIX: tmp + fsync + replace; object store:
                          single PUT — objects are already atomic.)
  commit_file(tmp, final) same commit for a file a LIBRARY already wrote
                          to `tmp` (parquet writers); tmp must be on the
                          same filesystem as final.
  publish_new(tmp, final) commit of a uniquely-named manifest file (never
                          overwrites — name collisions are a bug).
  exclusive_lock(path)    advisory crash-recoverable mutex: one holder at
                          a time, a crashed holder's lock is taken over
                          after `lease_s` by ANY waiter, takeover is
                          race-free among waiters, and release is a no-op
                          if the lock was usurped meanwhile (owner token).
                          Same-filesystem; O_EXCL is unreliable on NFSv2 —
                          route cross-host mutation through one process.

Reads (json/parquet metas, listdir, mtime) stay plain os/pyarrow calls:
every reader consumes only COMMITTED files (published through the ops
above), so read-after-commit visibility — which object stores provide —
is the only requirement, and no read needs to change per backend.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
import uuid


class PosixMetaFS:
    """POSIX/NFS implementation — the only backend in this sandbox. Each
    method's docstring states the mechanics; the CONTRACT lives in the
    module docstring."""

    def ensure_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def claim_dir(self, path: str) -> bool:
        """Atomic exclusive claim via POSIX mkdir: True = this caller owns
        the (new, empty) dir; False = it already existed (committed or
        in-flight — the caller decides via its own commit markers)."""
        try:
            os.mkdir(path)
            return True
        except FileExistsError:
            return False

    def promote_dir(self, src: str, dst: str) -> None:
        """Atomic same-filesystem rename of a finished staging dir."""
        os.rename(src, dst)

    def remove_dir(self, path: str, ignore_errors: bool = False) -> None:
        shutil.rmtree(path, ignore_errors=ignore_errors)

    def remove_file(self, path: str, missing_ok: bool = True) -> None:
        """Retract a single committed file — used to INVALIDATE a commit
        marker before rebuilding what it covers (readers degrade while the
        rebuild runs instead of trusting partial data)."""
        try:
            os.unlink(path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def publish_bytes(self, path: str, data: bytes) -> None:
        # dot-prefixed tmp (same naming as tmp_path) so a crash between
        # open and replace strands only a hidden sibling that dataset
        # readers ignore — and best-effort unlink on failure anyway
        tmp = self.tmp_path(path)
        try:
            with open(tmp, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        except BaseException:
            with contextlib.suppress(OSError):
                os.unlink(tmp)
            raise

    def publish_json(self, path: str, obj) -> None:
        self.publish_bytes(path, json.dumps(obj).encode("utf-8"))

    def commit_file(self, tmp: str, final: str) -> None:
        """Commit a fully-written tmp file over `final` (overwrite OK)."""
        os.replace(tmp, final)

    def publish_new(self, tmp: str, final: str) -> None:
        """Commit a uniquely-named file (manifest pattern — no overwrite
        expected; os.rename still overwrites a same-named FILE on POSIX,
        which is fine: identical-name manifests carry identical content)."""
        os.rename(tmp, final)

    def tmp_path(self, final: str) -> str:
        """A tmp sibling for commit_file — dot-prefixed so parquet dataset
        readers (pyarrow, Spark) ignore it if a crash strands it."""
        d, name = os.path.split(final)
        return os.path.join(d, f".{name}.tmp.{uuid.uuid4().hex}")

    @contextlib.contextmanager
    def exclusive_lock(self, path: str, lease_s: float = 30.0):
        """Crash-recoverable advisory mutex at `path` (O_EXCL lockfile +
        owner token + mtime lease — mechanics documented inline; the
        takeover is rename-first so exactly one waiter wins and none can
        unlink a fresh winner's lock, and release checks the token so a
        usurped holder never deletes the usurper's lock)."""
        token = uuid.uuid4().hex
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode("ascii"))
                os.close(fd)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(path) > lease_s:
                        # stale lock from a crashed holder. Takeover must
                        # be ATOMIC: rename-away first — only ONE waiter's
                        # rename of the same source succeeds, so a second
                        # waiter can never unlink the winner's freshly
                        # re-acquired lock (the unlink-based takeover's
                        # TOCTOU). A live holder slower than the lease can
                        # still be usurped — the documented trade-off of
                        # any crash-recoverable file lock.
                        stale = f"{path}.stale.{uuid.uuid4().hex}"
                        try:
                            os.rename(path, stale)
                            os.unlink(stale)
                        except FileNotFoundError:
                            pass  # another waiter won the takeover race
                        continue
                except FileNotFoundError:
                    continue  # holder just released; retry immediately
                time.sleep(0.01)
        try:
            yield
        finally:
            # release ONLY if the lock is still ours: a holder stalled past
            # the lease gets usurped, and its unconditional unlink would
            # delete the USURPER's fresh lock — letting a third writer into
            # the critical section. The token check shrinks that breach to
            # the read->unlink instant.
            try:
                with open(path) as lf:
                    still_mine = lf.read() == token
            except FileNotFoundError:
                still_mine = False  # usurped and released; nothing to do
            if still_mine:
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass


_METAFS: PosixMetaFS = PosixMetaFS()


def get_metafs() -> PosixMetaFS:
    return _METAFS


def set_metafs(fs) -> None:
    """Swap the process-wide backend (an object-store implementation must
    honor every contract in the module docstring)."""
    global _METAFS
    _METAFS = fs
