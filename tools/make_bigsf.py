"""Generate a 10x-scaled copy of an sf dir for LOCAL perf measurement.

The driver's round-end bench may run at sf=1.0 (50k docs / 6M lineitem —
BENCH_r05.json "sf": "1.0") while the local testdata tops out at sf0.1.
This tool unions K shifted copies of each sf0.1 table so optimization
measurements run at the driver's scale, not 10x below it.

Key shifting keeps join cardinalities right: copy i shifts every key by
i * (max_key + 1). Text/values are reused verbatim — term dfs scale by K,
which matches how a Zipf corpus grows closely enough for plan-shape and
wall-clock work. Output is NOT used by any query path or test — it is a
measurement fixture only (never written under /root/testdata).

Usage: python tools/make_bigsf.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_COLS = {
    "documents": ["doc_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    # dims copied once, unshifted
    "region": [],
    "nation": [],
    "supplier": [],
    "part": [],
}
COPY_ONCE = {"region", "nation", "supplier", "part"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/sfbig"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for table, cols in SHIFT_COLS.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        if table in COPY_ONCE:
            pq.write_table(t, f"{dst}/{table}.parquet")
            print(f"{table}: {t.num_rows} rows (copied once)")
            continue
        spans = {c: int(pc.max(t[c]).as_py()) + 1 for c in cols}
        parts = []
        for i in range(k):
            ti = t
            for c in cols:
                shifted = pc.add(ti[c], pa.scalar(i * spans[c], type=ti[c].type))
                ti = ti.set_column(ti.schema.get_field_index(c), c, shifted)
            parts.append(ti)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{table}.parquet")
        print(f"{table}: {out.num_rows} rows (x{k})")


if __name__ == "__main__":
    main()
