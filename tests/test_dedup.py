"""Dedup family vs exact-Jaccard / hamming / cosine oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from navgraph_osm_spark.functions.hashing import char_shingles, jaccard_exact
from navgraph_osm_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # family 0: exact duplicates (with whitespace noise)
    rows.append((0, BASE, "en"))
    rows.append((1, BASE + " ", "en"))
    rows.append((2, "  " + BASE.replace(" ", "  "), "en"))
    # family 1: near duplicates (one word changed)
    rows.append((3, BASE.replace("quick", "quack"), "en"))
    rows.append((4, BASE.replace("dog", "cat"), "en"))
    # unrelated
    rows.append((5, "completely different content about spark query engines and shuffles", "en"))
    rows.append((6, "ein ganz anderer deutscher text über datenverarbeitung und geografie", "de"))
    rows.append((7, "", "en"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(docs):
    out = exact_duplicates(docs).collect()
    assert len(out) == 1
    grp = out[0]
    assert grp["doc_ids"] == [0, 1, 2] and grp["keeper"] == 0 and grp["n_dups"] == 3


def test_ngram_jaccard_matches_python_oracle(docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, block_col="lang").collect()
    }
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = {}
    for a in rows:
        for b in rows:
            if a < b:
                ra, rb = rows[a], rows[b]
                j = jaccard_exact(char_shingles(ra), char_shingles(rb))
                if j >= 0.5:
                    want[(a, b)] = j
    # oracle blocks by lang too: drop cross-lang pairs (none qualify anyway)
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, num_hashes=128, bands=32, threshold=0.5).collect()
    }
    # all exact-dup pairs and near-dup pairs present; unrelated docs absent
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (0, 3) in pairs and (0, 4) in pairs
    assert not any(5 in p or 6 in p or 7 in p for p in pairs)


def test_simhash_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any((a in (5, 6) or b in (5, 6)) for a, b in pairs)


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(9)
    base = rng.normal(size=(10, 16))
    rows = []
    for i in range(10):
        rows.append((i, base[i].tolist()))
        rows.append((100 + i, (base[i] + rng.normal(scale=0.01, size=16)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.99, planes=6).collect()
    }
    want = {(i, 100 + i) for i in range(10)}
    # cosine oracle: all true pairs ≥0.99, others far below
    assert want <= got
    for a, b in got:
        va = base[a % 100] if a < 100 else None
        assert (b - a == 100) or (
            np.dot(base[a], base[b % 100]) > 0  # sanity for any extra pair
        )
    # verify cosines of reported pairs against numpy
    rows_d = {r[0]: np.array(r[1]) for r in rows}
    for r in embedding_near_dup_pairs(emb, threshold=0.99, planes=6).collect():
        va, vb = rows_d[r["id_a"]], rows_d[r["id_b"]]
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(cos - r["cosine"]) < 1e-9 and cos >= 0.99


def test_cluster_pairs_iterative_matches_fast_path(spark, monkeypatch):
    """Round-6: the small-graph union-find fast path must agree with the
    distributed label-propagation path (forced by shrinking the bounded
    probe to zero) on a random pair set with chains and merges."""
    import numpy as np
    import pandas as pd

    from navgraph_osm_spark.operators import dedup

    rng = np.random.default_rng(5)
    a = rng.integers(0, 200, 300)
    off = rng.integers(1, 40, 300)
    pairs_pd = pd.DataFrame({"id_a": a, "id_b": a + off}).drop_duplicates()
    pairs = spark.createDataFrame(pairs_pd, "id_a long, id_b long")
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_pairs(pairs).collect()
    }
    monkeypatch.setattr(dedup, "SMALL_GRAPH_EDGE_LIMIT", 0)
    slow = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_pairs(pairs).collect()
    }
    assert fast == slow
    assert fast  # non-trivial graph
