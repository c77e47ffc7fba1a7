#!/usr/bin/env python3
"""Scale-rehearsal data generator: expand /root/testdata/sf0.1 by an
integer factor (default 10 -> "sf1") without touching the read-only
driver data.

Strategy: K key-offset copies of the sf0.1 tables, so every value
distribution, join fan-out and selectivity is preserved exactly at K
times the rows. Two tables need more than offsets so that
similarity-structured queries scale like a real corpus (pairs ~ K,
not K^2):

  documents  - each copy applies its own seeded bijective permutation
               of the global token vocabulary (copy 0 = identity).
               A bijection preserves shingle equality, so the planted
               near/exact-duplicate pairs inside a copy survive
               verbatim, while cross-copy texts share almost no
               shingles. n_chars is recomputed from the permuted text.
  embeddings - each copy applies its own seeded random orthogonal
               rotation (copy 0 = identity). Rotation preserves norms,
               dot products and the per-label cluster geometry inside
               a copy; across copies the clusters land elsewhere on
               the sphere, as fresh data would.

region/nation stay fixed (non-scaling dimensions). events keeps its
30-day window and scales users, preserving per-user event density;
the ts column is written back as timestamp[ns] to keep the
TIMESTAMP(NANOS) physical type graft.Tables.load special-cases.

Usage: python3 tools/gen_sf.py [K] [OUT_DIR]
       defaults: K=10, OUT_DIR=/tmp/sf1
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

# sf0.1 dense 0-based key cardinalities (verified against the data)
CARD = {"customer": 15_000, "supplier": 1_000, "part": 20_000,
        "orders": 150_000, "lineitem": 600_000, "events": 100_000,
        "documents": 5_000, "embeddings": 2_000}


def offset(table: pa.Table, col: str, step: int, k: int) -> pa.Table:
    i = table.schema.get_field_index(col)
    t = table.schema.field(i).type
    shifted = pc.add(table.column(col), pa.scalar(step * k, type=t))
    return table.set_column(i, table.schema.field(i), shifted)


def regen_name(table: pa.Table, col: str, prefix: str) -> pa.Table:
    """Rebuild Name#%09d from the (already offset) key column so names
    stay consistent with keys in every copy."""
    keycol = {"c_name": "c_custkey", "s_name": "s_suppkey"}[col]
    keys = table.column(keycol).to_numpy()
    names = pa.array([f"{prefix}#{v:09d}" for v in keys], type=pa.string())
    i = table.schema.get_field_index(col)
    return table.set_column(i, table.schema.field(i), names)


def copies(name: str, transform):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    parts = [transform(src, k) for k in range(K)]
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{OUT}/{name}.parquet")
    print(f"{name}: {out.num_rows} rows")


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{OUT}/{t}.parquet")
        print(f"{t}: copied")

    copies("customer", lambda s, k: regen_name(
        offset(s, "c_custkey", CARD["customer"], k), "c_name", "Customer"))
    copies("supplier", lambda s, k: regen_name(
        offset(s, "s_suppkey", CARD["supplier"], k), "s_name", "Supplier"))
    copies("part", lambda s, k: offset(s, "p_partkey", CARD["part"], k))
    copies("orders", lambda s, k: offset(
        offset(s, "o_orderkey", CARD["orders"], k),
        "o_custkey", CARD["customer"], k))
    copies("lineitem", lambda s, k: offset(offset(offset(
        s, "l_orderkey", CARD["orders"], k),
        "l_partkey", CARD["part"], k),
        "l_suppkey", CARD["supplier"], k))
    copies("events", lambda s, k: offset(
        offset(s, "event_id", CARD["events"], k),
        "user_id", 1_500, k))

    # documents: per-copy vocabulary permutation
    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.split(" ")})

    def permute_docs(src: pa.Table, k: int) -> pa.Table:
        out = offset(src, "doc_id", CARD["documents"], k)
        if k == 0:
            return out
        rng = np.random.default_rng(42_000 + k)
        perm = rng.permutation(len(vocab))
        m = {vocab[i]: vocab[perm[i]] for i in range(len(vocab))}
        new_texts = [" ".join(m[w] for w in t.split(" ")) for t in texts]
        ti = out.schema.get_field_index("text")
        out = out.set_column(ti, out.schema.field(ti),
                             pa.array(new_texts, type=pa.string()))
        ni = out.schema.get_field_index("n_chars")
        out = out.set_column(ni, out.schema.field(ni),
                             pa.array([len(t) for t in new_texts],
                                      type=pa.int64()))
        return out

    copies("documents", permute_docs)

    # embeddings: per-copy orthogonal rotation
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]

    def rotate_emb(src: pa.Table, k: int) -> pa.Table:
        out = offset(src, "vec_id", CARD["embeddings"], k)
        if k == 0:
            return out
        rng = np.random.default_rng(43_000 + k)
        q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
        q *= np.sign(np.diag(r))  # fix QR sign ambiguity -> proper rotation
        rotated = (vecs @ q.astype(np.float32))
        ei = out.schema.get_field_index("embedding")
        return out.set_column(
            ei, out.schema.field(ei),
            pa.array([row for row in rotated.tolist()],
                     type=pa.list_(pa.float32())))

    copies("embeddings", rotate_emb)


if __name__ == "__main__":
    main()
