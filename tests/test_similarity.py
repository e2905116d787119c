"""ANN similarity search: brute-force exactness + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from navgraph_osm_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors (the realistic ANN regime): 15 centroids + noise
    rng = np.random.default_rng(13)
    centroids = rng.normal(size=(15, DIM)) * 3.0
    assign = rng.integers(0, 15, size=300)
    vecs = centroids[assign] + rng.normal(size=(300, DIM)) * 0.4
    rows = [(i, vecs[i].tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, vecs


def test_bruteforce_matches_numpy(emb):
    df, vecs = emb
    queries = df.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk_bruteforce(df, queries, k=5).toPandas()
    norms = np.linalg.norm(vecs, axis=1)
    for qid, grp in got.groupby("query_id"):
        cos = vecs @ vecs[qid] / (norms * norms[qid])
        order = np.lexsort((np.arange(300), -cos))[:5]
        assert grp.sort_values("rank")["vec_id"].tolist() == order.tolist()
        np.testing.assert_allclose(
            np.sort(grp["cosine"].to_numpy())[::-1], np.sort(cos[order])[::-1], rtol=1e-9
        )


def test_lsh_recall_at_10(emb):
    df, vecs = emb
    queries = df.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk_bruteforce(df, queries, k=10).toPandas()
    approx = cosine_topk_lsh(df, queries, k=10, dim=DIM, planes=8, probe_bits=2).toPandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, np.mean(recalls)
    # self-match is always rank 1 (query is in corpus)
    top1 = approx[approx["rank"] == 1]
    assert (top1["query_id"] == top1["vec_id"]).all()


def test_sign_bucket_expr_udf_parity(spark):
    """The Arrow matmul bucketer (used when dim x planes exceeds the literal
    limit) must produce identical buckets to the codegen expression path."""
    import numpy as np

    from navgraph_osm_spark.operators.similarity import (
        _EXPR_BUCKET_COEF_LIMIT,
        _sign_bucket_expr,
        _sign_bucket_udf,
        sign_bucket,
    )

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, rng.normal(size=300).tolist()) for i in range(150)],
        "vec_id long, embedding array<double>",
    )
    hyper = np.random.default_rng(42).normal(size=(12, 300))  # 3600 > limit
    assert hyper.size > _EXPR_BUCKET_COEF_LIMIT
    a = df.select("vec_id", _sign_bucket_expr("embedding", hyper).alias("b")).toPandas()
    b = df.select("vec_id", _sign_bucket_udf("embedding", hyper).alias("b")).toPandas()
    c = df.select("vec_id", sign_bucket("embedding", hyper).alias("b")).toPandas()
    for other in (b, c):
        merged = a.merge(other, on="vec_id")
        assert (merged["b_x"] == merged["b_y"]).all()


def test_ivf_recall_on_clustered_corpus(spark):
    """IVF with nprobe search must reach high recall@5 on blob-clustered
    vectors (the data shape IVF is built for)."""
    import numpy as np

    from navgraph_osm_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    rng = np.random.default_rng(17)
    centers = rng.normal(size=(10, 32)) * 4
    rows = []
    for i in range(500):
        c = i % 10
        rows.append((i, (centers[c] + rng.normal(size=32) * 0.3).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.limit(25).selectExpr("vec_id AS query_id", "embedding")
    exact = cosine_topk_bruteforce(corpus, queries, k=5).toPandas()
    approx = cosine_topk_ivf(
        corpus, queries, k=5, n_centroids=16, nprobe=4
    ).toPandas()
    want = exact.groupby("query_id")["vec_id"].apply(set)
    got = approx.groupby("query_id")["vec_id"].apply(set)
    recall = np.mean([len(want[q] & got.get(q, set())) / 5 for q in want.index])
    assert recall >= 0.9, recall
