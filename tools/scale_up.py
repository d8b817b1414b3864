#!/usr/bin/env python3
"""Dev-only scale-up generator (not library code; same status as check.py).

Replicates an sf dir R times with key-shifted replicas into an output
dir, preserving join topology: every int64 key column gets +r*BASE in
replica r, int32 dimension keys (nation/region) and all payloads stay
unchanged, and the shared dims region/nation are copied once. Events
keep their ns-timestamp column type (pyarrow writes timestamp[ns]
directly, which Spark cannot).

Usage: python3 tools/scale_up.py <srcSfDir> <outDir> [R=10]
"""
import sys
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


def main():
    src, out = sys.argv[1], sys.argv[2]
    r_total = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(out, exist_ok=True)
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
                shifted = shifted.set_column(
                    idx, k, pc.add(shifted.column(k), r * BASE))
            parts.append(shifted)
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
