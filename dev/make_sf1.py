#!/usr/bin/env python3
"""Regenerate the sf1 scale-rehearsal dataset (PLANS.md "sf1 scale
rehearsal"): a 10x replication of /root/testdata/sf0.1 written to
/tmp/graft_sf1. NOT part of the library - dev tooling only.

Shape (kept identical to the round-9 rehearsal so numbers compare):
 - documents: 10x rows; replica k of a doc keeps its text except the
   tail token (" r<k>" appended), so every replica is a NEAR-dup of its
   source and the near-dup candidate space grows ~100x, not 10x.
 - embeddings: 10x rows, replicas are EXACT copies (shifted vec_id) -
   9 true duplicate partners per source vector.
 - events: 10x rows with 10x the implants (user_id offset per replica).
 - Multi-row-group parquet everywhere: single-row-group files are
   unsplittable, which serializes CPU-heavy stages (see verify skill).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
# replication factor: 10 -> the round-9-comparable sf1 corpus; pass
# 100 (DST=/tmp/graft_sf10) for the round-20 sf10 rehearsal decade
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

import os
os.makedirs(DST, exist_ok=True)

docs = pq.read_table(f"{SRC}/documents.parquet")
n_docs = docs.num_rows
parts = []
for k in range(REPS):
    t = docs
    if k > 0:
        text = pc.binary_join_element_wise(
            t.column("text").cast(pa.string()), f" r{k}", "")
        t = t.set_column(t.schema.get_field_index("text"), "text", text)
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pc.add(t.column("n_chars"), len(f" r{k}")))
    ids = pc.add(t.column("doc_id"), k * n_docs)
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids)
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet",
               row_group_size=5000)

emb = pq.read_table(f"{SRC}/embeddings.parquet")
n_emb = emb.num_rows
parts = []
for k in range(REPS):
    t = emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id",
                       pc.add(emb.column("vec_id"), k * n_emb))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{DST}/embeddings.parquet",
               row_group_size=2000)

ev = pq.read_table(f"{SRC}/events.parquet")
n_ev = ev.num_rows
max_user = pc.max(ev.column("user_id")).as_py() + 1
parts = []
for k in range(REPS):
    t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                      pc.add(ev.column("event_id"), k * n_ev))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), k * max_user))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{DST}/events.parquet",
               row_group_size=50000)

# remaining tables pass through unchanged (relational gates only need
# them present at a consistent scale)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    p = f"{SRC}/{t}.parquet"
    if os.path.exists(p):
        pq.write_table(pq.read_table(p), f"{DST}/{t}.parquet",
                       row_group_size=50000)
print(f"wrote {DST}")
