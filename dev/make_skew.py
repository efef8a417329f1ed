#!/usr/bin/env python3
"""Generate the SKEWED scale-rehearsal dataset (round-10 item: hot
implant / hot band — round 9's uniform sf1 rehearsal never triggered
AQE's skew handling, so the skew machinery was correctness-pinned but
never engaged). NOT part of the library - dev tooling only.

Writes /tmp/graft_skew from /root/testdata/sf0.1:
 - events.parquet: 10x rows (1M), but replicas 1..3 reassign user_id
   to ONE hot user (424242) -> the hot key owns ~30% of all rows.
   Everything else gets a per-replica user_id offset (distinct cold
   keys). event_id stays globally unique.
 - documents.parquet: 10x rows (~50k), and ONE source doc is
   additionally replicated 3000x with a per-copy tail token (near-dup,
   not exact) -> its MinHash band buckets hold a ~3000-doc hot band
   (a boilerplate cluster: the candidate-join hot-key case).
 - embeddings.parquet: 10x rows, replicas exact copies (shifted
   vec_id), PLUS one source vector replicated 3000x -> a hot LSH
   bucket on the embedding side.
 - Multi-row-group parquet everywhere (single-row-group files are
   unsplittable - see verify skill).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_skew"
REPS = 10
HOT_USER = 424242
HOT_REPS = (1, 2, 3)          # replicas whose user_id all collapse to HOT_USER
HOT_COPIES = 3000             # hot near-dup cluster size (documents)
HOT_COPIES_VEC = 1000         # hot vector copies (pairs are quadratic in the verify)
ROW_GROUP = 50_000

os.makedirs(DST, exist_ok=True)

# ---- events: hot user owns ~30% ------------------------------------
ev = pq.read_table(f"{SRC}/events.parquet")
n_ev = ev.num_rows
parts = []
for k in range(REPS):
    t = ev
    ids = pc.add(t.column("event_id"), k * n_ev)
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id", ids)
    if k in HOT_REPS:
        uid = pa.array([HOT_USER] * n_ev, type=pa.int64())
    elif k > 0:
        uid = pc.add(t.column("user_id"), k * 1_000_000)
    else:
        uid = t.column("user_id")
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id", uid)
    parts.append(t)
out = pa.concat_tables(parts)
pq.write_table(out, f"{DST}/events.parquet", row_group_size=ROW_GROUP)
hot_frac = len(HOT_REPS) / REPS
print(f"events: {out.num_rows} rows, hot user {HOT_USER} owns {hot_frac:.0%}")

# ---- documents: 10x + one 3000-copy near-dup cluster ----------------
docs = pq.read_table(f"{SRC}/documents.parquet")
n_docs = docs.num_rows
parts = []
for k in range(REPS):
    t = docs
    if k > 0:
        text = pc.binary_join_element_wise(
            t.column("text").cast(pa.string()), f" r{k}", "")
        t = t.set_column(t.schema.get_field_index("text"), "text", text)
        if "n_chars" in t.schema.names:
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                             pc.add(t.column("n_chars"), len(f" r{k}")))
    ids = pc.add(t.column("doc_id"), k * n_docs)
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids)
    parts.append(t)
base = pa.concat_tables(parts)
# hot cluster: copies of source doc 0 with distinct tails
src_row = docs.slice(0, 1)
hot = []
for c in range(HOT_COPIES):
    t = src_row
    text = pc.binary_join_element_wise(
        t.column("text").cast(pa.string()), f" hot{c}", "")
    t = t.set_column(t.schema.get_field_index("text"), "text", text)
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                     pa.array([REPS * n_docs + c], type=pa.int64()))
    hot.append(t)
out = pa.concat_tables([base] + hot)
pq.write_table(out, f"{DST}/documents.parquet", row_group_size=ROW_GROUP)
print(f"documents: {out.num_rows} rows, hot cluster {HOT_COPIES} near-dups of doc 0")

# ---- embeddings: 10x exact replicas + one 3000-copy hot vector ------
emb = pq.read_table(f"{SRC}/embeddings.parquet")
n_emb = emb.num_rows
parts = []
for k in range(REPS):
    t = emb
    ids = pc.add(t.column("vec_id"), k * n_emb)
    t = t.set_column(t.schema.get_field_index("vec_id"), "vec_id", ids)
    parts.append(t)
base = pa.concat_tables(parts)
src_row = emb.slice(0, 1)
hot = []
for c in range(HOT_COPIES_VEC):
    t = src_row.set_column(src_row.schema.get_field_index("vec_id"), "vec_id",
                           pa.array([REPS * n_emb + c], type=pa.int64()))
    hot.append(t)
out = pa.concat_tables([base] + hot)
pq.write_table(out, f"{DST}/embeddings.parquet", row_group_size=ROW_GROUP)
print(f"embeddings: {out.num_rows} rows, hot vector x{HOT_COPIES_VEC}")
