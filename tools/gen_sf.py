#!/usr/bin/env python3
"""Derive a larger scale factor from an existing testdata dir by key-offset
replication — scale-evidence tooling (VERDICT r6 ask #2: one-off sf1.0
gate + bench run; /root/testdata is read-only, so the derived SF lives
under /tmp).

Usage: python3 tools/gen_sf.py <src_sf_dir> <out_dir> <factor>

Replication rules (copy i in 0..factor-1; copy 0 is the original,
byte-preserving ids):
  - region/nation: fixed-size dims, copied once as-is.
  - customer/supplier/part/orders/lineitem/events: every key column is
    offset by i*(max_key+1) consistently across tables, so FK joins stay
    valid within each copy and copies never collide.
  - documents: doc_id offset; for i>0 every token is prefixed with c<i>
    so copies are NOT near-duplicates of each other - without this,
    replication would square every near-dup cluster (10 exact copies of
    each member) and the sf0.1→sf1 pair-count ratios would be
    data-induced superlinear, hiding real plan superlinearity. Within a
    copy the original near-dup structure is preserved (the same
    transform applies to both members of a planted pair). n_chars is
    recomputed (it equals length(text) in the source data).
  - embeddings: vec_id offset; embedding[0] += i*1e-3 so copies are not
    exact-duplicate vectors (exact duplicates create distance ties whose
    engine-specific ordering would flap the kNN oracles).

The gate's validity does not depend on data provenance: Verify and the
DuckDB oracles read the SAME files, so correctness still means the two
engines agree; the bench ratios measure how the plans scale.
"""
import sys, os, re
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC, OUT, FACTOR = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(OUT, exist_ok=True)

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

# offsets must be consistent ACROSS tables (o_custkey offsets by the
# customer key base), so derive each base from the table that owns it
OWNER = {"c_custkey": ("customer", "c_custkey"),
         "s_suppkey": ("supplier", "s_suppkey"),
         "p_partkey": ("part", "p_partkey"),
         "o_orderkey": ("orders", "o_orderkey"),
         "o_custkey": ("customer", "c_custkey"),
         "l_orderkey": ("orders", "o_orderkey"),
         "l_partkey": ("part", "p_partkey"),
         "l_suppkey": ("supplier", "s_suppkey"),
         "event_id": ("events", "event_id"),
         "user_id": ("events", "user_id")}

bases = {}
def base_of(col):
    owner_table, owner_col = OWNER[col]
    key = (owner_table, owner_col)
    if key not in bases:
        t = pq.read_table(f"{SRC}/{owner_table}.parquet",
                          columns=[owner_col])
        bases[key] = pc.max(t.column(owner_col)).as_py() + 1
    return bases[key]


def copy_fixed(name):
    pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                   f"{OUT}/{name}.parquet", version="2.6")
    print(f"{name}: copied as-is")


def scale_keyed(name):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    copies = []
    for i in range(FACTOR):
        c = t
        for col in KEY_COLS[name]:
            idx = c.schema.get_field_index(col)
            shifted = pc.add(c.column(col),
                             pa.scalar(i * base_of(col),
                                       type=c.schema.field(col).type))
            c = c.set_column(idx, c.schema.field(col), shifted)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{OUT}/{name}.parquet", version="2.6")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def scale_documents():
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_base = pc.max(t.column("doc_id")).as_py() + 1
    rows = t.to_pylist()
    out_rows = []
    for i in range(FACTOR):
        for r in rows:
            rr = dict(r)
            rr["doc_id"] = r["doc_id"] + i * doc_base
            if i > 0:
                rr["text"] = re.sub(r"\S+", lambda m: f"c{i}" + m.group(0),
                                    r["text"])
                rr["n_chars"] = len(rr["text"])
            out_rows.append(rr)
    out = pa.Table.from_pylist(out_rows, schema=t.schema)
    pq.write_table(out, f"{OUT}/documents.parquet", version="2.6")
    print(f"documents: {t.num_rows} -> {out.num_rows}")


def scale_embeddings():
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_base = pc.max(t.column("vec_id")).as_py() + 1
    rows = t.to_pylist()
    out_rows = []
    for i in range(FACTOR):
        for r in rows:
            rr = dict(r)
            rr["vec_id"] = r["vec_id"] + i * vec_base
            if i > 0 and rr["embedding"]:
                v = list(rr["embedding"])
                v[0] = v[0] + i * 1e-3
                rr["embedding"] = v
            out_rows.append(rr)
    out = pa.Table.from_pylist(out_rows, schema=t.schema)
    pq.write_table(out, f"{OUT}/embeddings.parquet", version="2.6")
    print(f"embeddings: {t.num_rows} -> {out.num_rows}")


# optional 4th arg: comma-separated table subset (e.g. "documents" for
# the cheap documents-only ratio points at sf3+)
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
def wanted(name):
    return ONLY is None or name in ONLY

for name in ["region", "nation"]:
    if wanted(name):
        copy_fixed(name)
for name in ["customer", "supplier", "part", "orders", "lineitem",
             "events"]:
    if wanted(name):
        scale_keyed(name)
if wanted("documents"):
    scale_documents()
if wanted("embeddings"):
    scale_embeddings()
print("done:", OUT)
