#!/usr/bin/env python3
"""Generate an sf1-equivalent dataset (10x sf0.1) for the SCALE PROBE.

Replicates every scalable table of /root/testdata/sf0.1 ten times with
shifted keys, preserving referential integrity (orders->customer,
lineitem->orders/part/supplier, events per-user timelines). Documents
get a per-copy token suffix (distinct token universes per copy) and
embeddings a per-copy deterministic perturbation, so NEAR-DUP DENSITY
stays constant: per-query work should scale ~linearly in rows, which is
exactly what the probe measures. Fixed dimensions (region, nation) are
copied as-is, mirroring TPC-H scaling.

Output is ephemeral probe input (default /tmp/graft_sf1), never a
replacement for the driver-generated testdata.

Usage: python3 scripts/make_scale.py [outdir] [copies]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# key column -> per-copy shift stride (all divisible by 5 so the
# doc_id % 5 sampling keeps its density; all far below the 1e9 gaps
# between graft's entity-id bases)
STRIDES = {
    "customer": {"c_custkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 10_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 10_000},
}
FIXED = ["region", "nation"]


def shifted_copy(table: pa.Table, name: str, k: int) -> pa.Table:
    cols = {}
    for field in table.schema:
        col = table[field.name]
        stride = STRIDES[name].get(field.name)
        if stride is not None and k > 0:
            col = pa.chunked_array(
                [pa.compute.add(c, k * stride) for c in col.chunks],
                type=field.type)
        cols[field.name] = col
    t = pa.table(cols, schema=table.schema)
    if name == "documents" and k > 0:
        # distinct token universe per copy: suffix every token, so the
        # copies add rows WITHOUT adding cross-copy near-dup pairs --
        # pair-graph size scales linearly with the corpus
        texts = t["text"].to_pylist()
        suffixed = [" ".join(f"{w}_{k}" for w in (s or "").split())
                    for s in texts]
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(suffixed, type=pa.string()))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pa.array([len(s) for s in suffixed],
                                  type=pa.int64()))
    if name == "embeddings" and k > 0:
        # deterministic per-copy perturbation keeps the similarity
        # structure per copy without exact cross-copy duplicates
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float32)
        noise = np.random.default_rng(k).normal(0.0, 0.1, mat.shape)
        mat = (mat + noise).astype(np.float32)
        emb_type = t.schema.field("embedding").type
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                         pa.array(list(mat), type=emb_type))
    return t


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    for name in FIXED:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(src, f"{OUT}/{name}.parquet")
        print(f"{name}: {src.num_rows} rows (fixed dim)")
    for name in STRIDES:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        copies = [shifted_copy(src, name, k) for k in range(COPIES)]
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{OUT}/{name}.parquet",
                       row_group_size=1_000_000)
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
