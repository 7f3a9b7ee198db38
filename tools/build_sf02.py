"""Build the sf0.2 bench fixture (VERDICT r12 item 2) — a 2x scale
point derived from the driver's sf0.1 parquet, so the bench becomes a
curve instead of a point.

Scaling mirrors the driver's own generator behavior (sf0.01 -> sf0.1
scales customer/supplier/part/orders/lineitem/events/documents/
embeddings linearly; nation/region fixed): every scaling table is
replicated 2x with per-table key offsets that keep referential
integrity INSIDE each copy (copy-2 orders reference copy-2 customers)
and never collide with the graph node-id spaces (offsets are ~1e6-1e8,
ORDER_OFFSET/PART_OFFSET are 2^40). Timestamps are left unchanged —
2x density in the same date range, which is how TPC-H growth works.

Pyarrow does the roundtrip (not Spark) so the PHYSICAL parquet types
— including events.ts's timestamp encoding — are byte-compatible with
the driver fixture and every load-path normalization behaves
identically.

HONEST LIMITS (documented for SCALING.md): copy-2 keys are disjoint
from copy-1, so the derived customer-order-part graph becomes two
disjoint sf0.1-shaped components — graph-loop keys see 2x edge scans
and 2x CC/degree output but the SAME traversal depth, and
min-custkey-anchored sources live in copy 1. documents text content
duplicates 2x, so dedup keys see a +~50% duplicate rate (the same
trade the sf1 docs10 soak made deliberately). Read graph/dedup
exponents with that in mind; relational/window/stream keys scale the
faithful TPC-H way.

Usage: python tools/build_sf02.py [dst=/tmp/neo_olap_sf0.2]
Idempotent: skips tables whose output already exists.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
N_COPIES = 2

# per-table (column -> per-copy key offset); offsets chosen far above
# each key's sf0.1 max (o_orderkey<150k, others <=20k, event_id<100k)
OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
SHARED = ("nation", "region")


def build(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in SHARED:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)
    for t, offs in OFFSETS.items():
        out = f"{dst}/{t}.parquet"
        if os.path.exists(out):
            continue
        src = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for k in range(N_COPIES):
            tab = src
            for col, off in offs.items():
                if k == 0:
                    continue
                i = tab.schema.get_field_index(col)
                typ = tab.schema.field(i).type
                shifted = pc.cast(
                    pc.add(tab.column(col), pa.scalar(k * off, type=typ)),
                    typ,
                )
                tab = tab.set_column(i, tab.schema.field(i), shifted)
            copies.append(tab)
        combined = pa.concat_tables(copies)
        pq.write_table(combined, out + ".tmp", compression="snappy")
        os.replace(out + ".tmp", out)
        print(f"{t}: {src.num_rows} -> {combined.num_rows}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/neo_olap_sf0.2")
