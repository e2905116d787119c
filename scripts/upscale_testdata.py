#!/usr/bin/env python3
"""Build an ~sf1.0-scale dataset in /tmp by replicating sf0.1 with key offsets.

Measurement aid only (the driver generates its own sf1.0): joins keep their
fan-out because every foreign key is offset consistently per copy; documents
get a per-copy letter permutation (within-copy duplicate structure preserved,
cross-copy trigram sets disjoint — replicating text verbatim would square the
LSH bucket sizes and distort the dedup benchmarks); embeddings are rolled per
copy for the same reason.  nation/region stay single-copy (dimension tables).
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OFF = 10_000_000_000  # key offset per copy; far above any sf0.1 key

KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE = ["nation", "region"]


def permute_text(arr: pa.ChunkedArray, k: int) -> pa.Array:
    if k == 0:
        return arr.combine_chunks()
    rng = np.random.default_rng(1234 + k)
    letters = list(string.ascii_lowercase)
    perm = rng.permutation(26)
    table = str.maketrans(
        string.ascii_lowercase + string.ascii_uppercase,
        "".join(letters[i] for i in perm)
        + "".join(letters[i].upper() for i in perm),
    )
    py = arr.to_pylist()
    return pa.array([None if s is None else s.translate(table) for s in py])


def roll_embeddings(arr: pa.ChunkedArray, k: int) -> pa.Array:
    if k == 0:
        return arr.combine_chunks()
    lists = arr.to_pylist()
    return pa.array(
        [None if v is None else list(np.roll(v, k)) for v in lists],
        type=arr.type,
    )


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for t in SINGLE:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(t, "copied")
    for t, keys in KEYED.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        outs = []
        for k in range(COPIES):
            cols = {}
            for name in src.column_names:
                col = src.column(name)
                if name in keys:
                    cols[name] = pc.add(col, pa.scalar(k * OFF, type=col.type))
                elif t == "documents" and name == "text":
                    cols[name] = permute_text(col, k)
                elif t == "embeddings" and name == "embedding":
                    cols[name] = roll_embeddings(col, k)
                else:
                    cols[name] = col.combine_chunks()
            outs.append(pa.table(cols))
        big = pa.concat_tables(outs)
        # several row groups so scans parallelize like real multi-file input
        pq.write_table(big, f"{DST}/{t}.parquet", row_group_size=max(65536, big.num_rows // 16))
        print(t, big.num_rows)


if __name__ == "__main__":
    main()
