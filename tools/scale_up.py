#!/usr/bin/env python3
"""Dev-only scale-up generator (not library code; same status as check.py).

Replicates an sf dir R times with key-shifted replicas into an output
dir, preserving join topology: every int64 key column gets +r*BASE in
replica r, int32 dimension keys (nation/region) and all payloads stay
unchanged, and the shared dims region/nation are copied once. Events
keep their ns-timestamp column type (pyarrow writes timestamp[ns]
directly, which Spark cannot).

With --unique-docs, replica r>0 of the documents table gets UNIQUE
synthetic texts: each doc's tokens are deterministically shuffled with
a seed of (r, doc_id). This grows the DISTINCT-content count ~R× (the
axis verbatim replicas never exercise: md5 contraction, bigram term
space, prefix-join gram sets and LM bigram stats all grow), while
keeping length distribution and unigram bags realistic.

With --unique-embeddings, replica r>0 of the embeddings table gets
UNIQUE vectors: each dimension is perturbed by deterministic
seeded noise (±10% of the dim's value plus a small absolute term),
so SRP signatures, KMeans cells and quantization grids all see ~R×
distinct vectors instead of R-replica cliques.

With --skew zipf:ALPHA, replica r>0's FOREIGN keys are re-drawn from a
Zipf(alpha) distribution over the replica's own dimension-key domain
instead of inheriting the base's uniform pattern: a few hot customers
own most orders, a few hot parts/suppliers dominate lineitems, a few
hot users emit most events. Referential integrity is preserved (every
drawn key exists in the replica's dimension; primary keys keep the
plain +r*BASE shift so uniqueness and the orders↔lineitem linkage are
untouched). Rank→key goes through a seeded permutation so the hot key
is arbitrary, not systematically key 0 (which several queries treat
specially, e.g. BFS seeds at user_id % 211 == 0). Everything is
seeded → byte-reproducible.

Usage: python3 tools/scale_up.py <srcSfDir> <outDir> [R=10]
       [--unique-docs] [--unique-embeddings] [--skew zipf:ALPHA]
"""
import random
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

BASE = 1_000_000_000  # far above any base key and the +1e7 synthetic-dup offset

SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


# FK column -> the dimension table whose key domain it draws from.
# Dimension key domains are contiguous 0..N-1 in the generated data
# (asserted below against the actual dim at runtime).
FK_DOMAINS = {
    ("orders", "o_custkey"): ("customer", "c_custkey"),
    ("lineitem", "l_partkey"): ("part", "p_partkey"),
    ("lineitem", "l_suppkey"): ("supplier", "s_suppkey"),
    ("events", "user_id"): ("events", "user_id"),  # self-domain (actor ids)
}


def _seed(s):
    """str -> stable int seed (hash() is per-process randomized)."""
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def zipf_ranks(n_draws, domain, alpha, seed):
    """n_draws Zipf(alpha) ranks over 0..domain-1, deterministic."""
    p = 1.0 / np.power(np.arange(1, domain + 1, dtype=np.float64), alpha)
    p /= p.sum()
    rng = np.random.default_rng(_seed(seed))
    return rng.choice(domain, size=n_draws, p=p)


def skewed_fk(t, table, col, r, alpha, dims):
    """Replica r's FK column re-drawn Zipf-skewed over the dim domain."""
    dim_table, dim_key = FK_DOMAINS[(table, col)]
    domain = dims[(dim_table, dim_key)]
    ranks = zipf_ranks(t.num_rows, domain, alpha, f"skew:{table}:{col}:{r}")
    # seeded rank->key permutation: the hot key is arbitrary per replica
    perm = np.arange(domain, dtype=np.int64)
    np.random.default_rng(_seed(f"skewperm:{table}:{col}:{r}")).shuffle(perm)
    keys = perm[ranks] + r * BASE
    return pa.array(keys, type=t.schema.field(col).type)


def shuffled_texts(t, r):
    """Deterministic per-(replica, doc) token shuffle of the text col."""
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out = []
    for doc_id, text in zip(doc_ids, texts):
        toks = text.split(" ")
        random.Random(f"uniq:{r}:{doc_id}").shuffle(toks)
        out.append(" ".join(toks))
    return pa.array(out, type=t.schema.field("text").type)


def perturbed_embeddings(t, r):
    """Deterministic per-(replica, vec) noise on the embedding col."""
    vec_ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    out = []
    for vec_id, e in zip(vec_ids, embs):
        rng = random.Random(f"emb:{r}:{vec_id}")
        out.append([v + v * (rng.random() - 0.5) * 0.2 +
                    (rng.random() - 0.5) * 0.01 for v in e])
    return pa.array(out, type=t.schema.field("embedding").type)


def main():
    args = []
    alpha = None
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--skew":
            spec = next(it)
            assert spec.startswith("zipf:"), f"unknown skew spec {spec}"
            alpha = float(spec.split(":")[1])
        elif not a.startswith("--"):
            args.append(a)
    unique_docs = "--unique-docs" in sys.argv
    unique_embs = "--unique-embeddings" in sys.argv
    src, out = args[0], args[1]
    r_total = int(args[2]) if len(args) > 2 else 10
    import os
    os.makedirs(out, exist_ok=True)
    # dimension-domain sizes for --skew, asserted contiguous 0..N-1
    dims = {}
    if alpha is not None:
        for dim_table, dim_key in set(FK_DOMAINS.values()):
            col = pq.read_table(f"{src}/{dim_table}.parquet",
                                columns=[dim_key]).column(dim_key)
            lo = pc.min(col).as_py()
            hi = pc.max(col).as_py()
            n = len(pc.unique(col))
            assert lo == 0 and hi == n - 1, \
                f"{dim_table}.{dim_key} domain not contiguous 0..N-1"
            dims[(dim_table, dim_key)] = n
    for table, keys in SHIFTS.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        if not keys:  # shared dims: copy once
            pq.write_table(t, f"{out}/{table}.parquet")
            print(f"{table}: copied {t.num_rows}")
            continue
        parts = [t]
        for r in range(1, r_total):
            shifted = t
            for k in keys:
                idx = shifted.schema.get_field_index(k)
                if alpha is not None and (table, k) in FK_DOMAINS:
                    shifted = shifted.set_column(
                        idx, k, skewed_fk(t, table, k, r, alpha, dims))
                else:
                    shifted = shifted.set_column(
                        idx, k, pc.add(shifted.column(k), r * BASE))
            if unique_docs and table == "documents":
                idx = shifted.schema.get_field_index("text")
                shifted = shifted.set_column(
                    idx, "text", shuffled_texts(t, r))
            if unique_embs and table == "embeddings":
                idx = shifted.schema.get_field_index("embedding")
                shifted = shifted.set_column(
                    idx, "embedding", perturbed_embeddings(t, r))
            parts.append(shifted)
        big = pa.concat_tables(parts)
        # bounded row groups: one giant row group makes the whole file a
        # single Spark map task, which (a) serializes the scan and (b)
        # makes AQE's skew-join split a no-op (a skewed reduce partition
        # can only split along map-block boundaries). Real lake files
        # carry many row groups; mirror that.
        pq.write_table(big, f"{out}/{table}.parquet", row_group_size=100_000)
        print(f"{table}: {t.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
