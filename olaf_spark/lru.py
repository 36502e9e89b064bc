"""Tiny signature-keyed LRU for the serving-gate caches.

One idiom, one place (previously hand-rolled in four spots across
bigram/phrase/similarity): pop (recency bump), compare the freshness
signature, reload on miss, reinsert, evict oldest past the bound.

The freshness signature is (st_ino, st_mtime_ns) of the backing file or
directory (`file_sig`), NOT a bare float mtime: every commit in this
engine replaces its target wholesale (publish/commit = tmp + rename;
rebuilds remove + recreate their dirs), so the inode always changes on
republish — closing the staleness window a float-mtime key leaves open
on coarse-granularity filesystems (a retract-and-republish landing
within one mtime quantum on a 1 s-resolution NFS export would otherwise
serve the OLD cached value over NEW rows indefinitely).
"""

from __future__ import annotations

import os
from collections.abc import Callable


def file_sig(path: str) -> tuple[int, int] | None:
    """(st_ino, st_mtime_ns) of path, or None when it cannot be stat'd.

    Catches OSError, not just FileNotFoundError: callers documented as
    never-raise (bigrams_usable, has_bigram_rows, group_heads) reach this
    with paths where a stray FILE may sit in a directory position
    (NotADirectoryError) or permissions may forbid the stat — any of
    those means "treat as absent", matching positions_usable's posture."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    return (st.st_ino, st.st_mtime_ns)


def lru_get(cache: dict, key, sig, load: Callable, max_size: int = 256):
    """cache[key] holds (sig, value); calls load() when absent or stale.

    Popping before reinsert makes dict order the recency order; eviction
    drops the least-recently-used entry once the bound is crossed.
    """
    hit = cache.pop(key, None)
    if hit is None or hit[0] != sig:
        hit = (sig, load())
    cache[key] = hit
    while len(cache) > max_size:
        cache.pop(next(iter(cache)))
    return hit[1]
