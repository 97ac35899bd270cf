#!/usr/bin/env python
"""Build a 10x weak-scaling replica of an sf directory (default: sf0.1 ->
/tmp/sf1) for the SCALE.md §29 second-scale-factor measurement.

The driver's testdata tops out at sf0.1 and is read-only, so the sf1
point is synthesized here as TEN DISJOINT REPLICAS of sf0.1: replica 0
is a byte-identical copy; replicas 1-9 offset every join/entity key by
`replica * (max_key + 1)` so referential integrity holds WITHIN each
replica and no key collides ACROSS replicas. Document text is
word-salted per replica (each word gets a replica suffix) so the
near-dup structure of each replica matches sf0.1 exactly while no
shingle survives across replicas — without this, ten verbatim copies of
every document would form size-10 duplicate clusters and the measured
pair volume would test the REPLICATION artifact, not the engine's
candidate-pair law. n_chars is recomputed after salting.

What this harness CAN test: whether `shuffle_write_rows / input_rows`
stays constant at 10x the rows for plans whose claimed law is linear
(the §29 falsifiable check). What it CANNOT create: cross-replica key
skew (the hottest key is exactly as hot as at sf0.1, times one) or
cross-replica near-dups; a plan whose cost is driven by single-key
hotness needs a skew-aware generator instead. Embeddings are replicated
with offset ids but identical vectors — fine for shuffle-volume laws,
NOT for ANN-recall statistics (each point gains 9 zero-distance twins).

Dimension tables (region, nation) are shared, not replicated — every
replica's foreign keys keep pointing at the same 25/5 rows, as a bigger
TPC-H would.

Usage: python tools/make_scale10.py [SRC_DIR] [DST_DIR] [K]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: Integer key columns to offset per replica, per table. Only columns
#: that identify entities or join rows — measures/attributes stay.
KEY_COLUMNS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: Shared dimension tables: copied once, never replicated.
SHARED = ("region", "nation")


def _salt_words(text_col: pa.ChunkedArray, replica: int) -> pa.Array:
    """Append a replica token to every word: cross-replica shingles become
    disjoint while within-replica duplicate/near-dup structure (and word
    count) is preserved exactly."""
    suffix = f"q{replica}"
    salted = pc.replace_substring_regex(text_col, r"(\S+)", rf"\1{suffix}")
    return salted.combine_chunks() if isinstance(salted, pa.ChunkedArray) else salted


def build(src: str, dst: str, k: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in SHARED:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet")
        print(f"{name}: shared copy")
    for name, keys in KEY_COLUMNS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        strides = {
            c: pc.max(t.column(c)).as_py() + 1 for c in keys
        }
        replicas = []
        for r in range(k):
            rep = t
            for c in keys:
                idx = rep.schema.get_field_index(c)
                shifted = pc.add(rep.column(c), r * strides[c])
                rep = rep.set_column(idx, rep.schema.field(c), shifted.cast(rep.schema.field(c).type))
            if name == "documents" and r > 0:
                ti = rep.schema.get_field_index("text")
                salted = _salt_words(rep.column("text"), r)
                rep = rep.set_column(ti, rep.schema.field("text"), salted)
                ni = rep.schema.get_field_index("n_chars")
                nchars = pc.utf8_length(rep.column("text"))
                rep = rep.set_column(
                    ni, rep.schema.field("n_chars"),
                    nchars.cast(rep.schema.field("n_chars").type),
                )
            replicas.append(rep)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dst, k)
