"""Approximate-nearest-neighbor search over the embedding column.

Two paths (graft additions for the training-data pipeline):

- ``cosine_topk_bruteforce`` — exact baseline: query×corpus equi-free join
  with the dot product computed via ``zip_with``/``aggregate`` higher-order
  functions (JVM-side, no Python), bounded-window top-k.
- ``cosine_topk_lsh`` — scale path: sign-LSH (random hyperplanes) bucket
  join with multi-probe, then exact cosine re-rank within candidates.
  An IVF variant would swap the bucketer for k-means assignments; the
  bucket-join + re-rank skeleton is identical.

At 100 TB the corpus side is bucketed once (write-time partitioning on
``bucket``), queries explode to their probe set, and the join is equi on
``bucket`` — no cross join anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank)."""
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(query_id), F.col(vec_col).alias("q_vec"))
    scored = q.crossJoin(c).withColumn(
        "cosine",
        (_dot(F.col("q_vec"), F.col("c_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))).cast("double"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def _sign_bucket_expr(vec_col: str, hyper: np.ndarray):
    bits = None
    for i in range(hyper.shape[0]):
        arr = F.array(*[F.lit(float(v)) for v in hyper[i]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = (dot >= 0).cast("long")
        bits = bit if bits is None else bits * 2 + bit
    return bits


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    planes: int = 8,
    probe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Sign-LSH bucketed approximate top-k with multi-probe.

    Recall grows with probe_bits (flipping up to that many bucket bits).
    """
    rng = np.random.default_rng(seed)
    hyper = rng.normal(size=(planes, dim))
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("c_vec"), _sign_bucket_expr(vec_col, hyper).alias("bucket")
    )
    q0 = queries.select(
        F.col(query_id), F.col(vec_col).alias("q_vec"), _sign_bucket_expr(vec_col, hyper).alias("bucket0")
    )
    probes = [F.col("bucket0")]
    if probe_bits >= 1:
        probes += [F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
    if probe_bits >= 2:
        probes += [
            F.col("bucket0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(planes)
            for j in range(i + 1, planes)
        ]
    q = q0.withColumn("bucket", F.explode(F.array(*probes)))
    scored = (
        q.join(c, "bucket")
        .dropDuplicates([query_id, id_col])
        .withColumn(
            "cosine",
            (_dot(F.col("q_vec"), F.col("c_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))).cast("double"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )
