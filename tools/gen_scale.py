#!/usr/bin/env python3
"""Dev-only scaling-data generator (driver-side tooling, like
check_oracle.py — the engine itself never runs Python).

Synthesizes an ~Nx replica of a testdata sf directory for scaling-ratio
measurement: each replica shifts every key column by i * (max+1) so
referential integrity holds and per-key group sizes stay identical;
document text gets a per-replica word suffix (within-replica shingle /
near-dup structure preserved exactly, zero cross-replica collisions);
embeddings get a per-replica deterministic sign-flip pattern (norms and
within-replica geometry preserved, cross-replica cosine ~ 0). The
result behaves like N disjoint copies of the original corpus — the
honest null hypothesis for "does the engine scale linearly".

Usage: gen_scale.py <src_sf_dir> <out_dir> <replicas>
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)

def shift(col, off):
    return pc.add(col, pa.scalar(off, type=col.type))

def max1(t, name):
    return pc.max(t[name]).as_py() + 1

def replicate(table, keycols, i, maxes):
    cols = {}
    for name in table.column_names:
        c = table[name]
        cols[name] = shift(c, i * maxes[name]) if name in keycols else c
    return pa.table({n_: cols[n_] for n_ in table.column_names},
                    schema=table.schema)

def write(name, tables):
    t = pa.concat_tables(tables)
    pq.write_table(t, f"{out}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows")

# --- fixed dims: copy once
for name in ["nation", "region"]:
    t = pq.read_table(f"{src}/{name}.parquet")
    pq.write_table(t, f"{out}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows (dim, unscaled)")

# --- relational tables: key-shifted replicas
plain = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# shared offsets so foreign keys line up across tables
offsets = {}
for name, keys in plain.items():
    t = pq.read_table(f"{src}/{name}.parquet")
    for k in keys:
        base = {"o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
                "l_partkey": "p_partkey", "l_suppkey": "s_suppkey"}.get(k, k)
        if base not in offsets:
            bt = t if base == k else pq.read_table(
                f"{src}/{[n_ for n_, ks in plain.items() if base in ks][0]}.parquet")
            offsets[base] = max1(bt, base)
for name, keys in plain.items():
    t = pq.read_table(f"{src}/{name}.parquet")
    maxes = {k: offsets[{"o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
                         "l_partkey": "p_partkey", "l_suppkey": "s_suppkey"}.get(k, k)]
             for k in keys}
    write(name, [replicate(t, set(keys), i, maxes) for i in range(n)])

# --- documents: suffix every word per replica
t = pq.read_table(f"{src}/documents.parquet")
doff = max1(t, "doc_id")
reps = []
texts0 = t["text"].to_pylist()
for i in range(n):
    if i == 0:
        reps.append(t)
        continue
    texts = [" ".join(w + f"r{i}" for w in s.split(" ")) for s in texts0]
    reps.append(pa.table({
        "doc_id": shift(t["doc_id"], i * doff),
        "text": pa.array(texts, type=pa.string()),
        "lang": t["lang"].combine_chunks(),
        "source": t["source"].combine_chunks(),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    }, schema=t.schema))
write("documents", reps)

# --- embeddings: deterministic sign-flip per replica
t = pq.read_table(f"{src}/embeddings.parquet")
voff = max1(t, "vec_id")
embs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
dim = embs.shape[1]
reps = []
for i in range(n):
    if i == 0:
        reps.append(t)
        continue
    j = np.arange(dim)
    signs = np.where(((i * 1000003 + j * 7919) >> 3) & 1 == 1, -1.0, 1.0).astype(np.float32)
    flipped = embs * signs
    reps.append(pa.table({
        "vec_id": shift(t["vec_id"], i * voff),
        "embedding": pa.array(list(flipped), type=t.schema.field("embedding").type),
        "label": t["label"].combine_chunks(),
    }, schema=t.schema))
write("embeddings", reps)
print("done:", out)
