#!/usr/bin/env python3
"""Synthesize /tmp/sf1 as a 10x key-shifted replication of sf0.1.

Perf-sweep data ONLY (never a correctness oracle): each copy i shifts
every key column by i*stride (stride = max(key)+1 from sf0.1) so PKs
stay unique and FK joins keep their fanout; fixed dims (region, nation)
are passed through unchanged. Text/embedding payloads repeat, which is
fine for a scale sweep — cardinality-per-key and join shapes are what
the sweep measures.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import os

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns to shift (by that column's own stride)
SHIFT = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}

os.makedirs(DST, exist_ok=True)
strides = {}
for t in ["customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"]:
    tab = pq.read_table(f"{SRC}/{t}.parquet")
    for c in SHIFT[t]:
        key = c.split("_", 1)[1]  # o_custkey and c_custkey share a stride
        v = pa.compute.max(tab[c]).as_py() + 1
        strides[key] = max(strides.get(key, 0), v)

for t, cols in SHIFT.items():
    tab = pq.read_table(f"{SRC}/{t}.parquet")
    if not cols:
        pq.write_table(tab, f"{DST}/{t}.parquet")
        print(t, tab.num_rows, "(passthrough)")
        continue
    copies = []
    for i in range(COPIES):
        if i == 0:
            copies.append(tab)
            continue
        arrays = []
        for name in tab.column_names:
            col = tab[name]
            if name in cols:
                stride = strides[name.split("_", 1)[1]]
                col = pa.compute.add(col, i * stride)
            arrays.append(col)
        copies.append(pa.table(dict(zip(tab.column_names, arrays))))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{DST}/{t}.parquet", row_group_size=1_000_000)
    print(t, out.num_rows)
print("done ->", DST)
