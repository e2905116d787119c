"""Approximate-nearest-neighbor search over the embedding column.

Two paths (graft additions for the training-data pipeline):

- ``cosine_topk_bruteforce`` — exact baseline: query×corpus equi-free join
  with the dot product computed via ``zip_with``/``aggregate`` higher-order
  functions (JVM-side, no Python), bounded-window top-k.
- ``cosine_topk_lsh`` — scale path A: sign-LSH (random hyperplanes) bucket
  join with multi-probe, then exact cosine re-rank within candidates.
- ``cosine_topk_ivf`` — scale path B: k-means coarse quantizer (IVF) with
  nprobe search; same bucket-join + re-rank skeleton, data-adaptive cells
  (better than LSH when the corpus is clustered).

At 100 TB the corpus side is bucketed once (write-time partitioning on
``bucket``), queries explode to their probe set, and the join is equi on
``bucket`` — no cross join anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    from navgraph_osm_spark.sources.tables import spread_scan

    # the per-pair HOF dot products run inside the corpus scan tasks (the
    # query side is the broadcast); spread an unsplittable one-file corpus.
    # Norms are evaluated once per SIDE (|C| + |Q| HOF aggregates) instead
    # of once per pair (2·|C|·|Q|) — the cosine expression tree is
    # unchanged (dot / (q_norm * c_norm)), so values are bit-identical.
    c = spread_scan(corpus).select(
        F.col(id_col), F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("__c_norm"),
    )
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("__q_norm"),
    )
    scored = q.crossJoin(c).withColumn(
        "cosine",
        (_dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__q_norm") * F.col("__c_norm"))).cast("double"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


# above this many literal coefficients the JVM-expression bucketer bloats
# the plan (round-1 review note) AND loses to one vectorized matmul
_EXPR_BUCKET_COEF_LIMIT = 2048


def _sign_bucket_expr(vec_col: str, hyper: np.ndarray):
    """Sign-LSH bucket as pure column expressions (codegen'd).

    Right for small dim × planes; each hyperplane is a literal array.  For
    large embeddings dispatch goes to :func:`_sign_bucket_udf` instead —
    literal-array plans grow with dim and a single Arrow-batched matmul is
    faster anyway."""
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


def _sign_bucket_udf(vec_col: str, hyper: np.ndarray):
    """Sign-LSH bucket via one Arrow-batched matmul (X @ H.T >= 0), packed
    to the same bit order as the expression path (plane 0 = MSB)."""
    H = np.ascontiguousarray(hyper, dtype=np.float64)
    weights = (1 << np.arange(H.shape[0] - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def _bucket(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        bits = (X @ H.T) >= 0
        return pd.Series(bits @ weights)

    return _bucket(F.col(vec_col))


def sign_bucket(vec_col: str, hyper: np.ndarray):
    """Auto-dispatch bucketer: codegen expressions while the literal count
    is small, Arrow matmul beyond ``_EXPR_BUCKET_COEF_LIMIT`` coefficients."""
    if hyper.size <= _EXPR_BUCKET_COEF_LIMIT:
        return _sign_bucket_expr(vec_col, hyper)
    return _sign_bucket_udf(vec_col, hyper)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 64,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    max_train: int = 100_000,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer + nprobe search.

    The corpus is assigned to its nearest centroid (at warehouse scale this
    is write-time partitioning on the bucket column — one scan, pruned by
    the probe list); queries probe their ``nprobe`` nearest centroids and
    re-rank candidates by exact cosine.  Vectors are L2-normalized before
    quantization so Euclidean cell assignment tracks cosine neighborhoods.

    Training runs on a bounded corpus sample (``max_train``); assignment is
    MLlib's codegen'd transform; the per-query probe list is one
    Arrow-batched matmul against the (driver-small) centroid matrix.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    unit = F.transform(F.col(vec_col), lambda x: x / _norm(F.col(vec_col)))
    feat = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(unit).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(
        feat.limit(max_train)
    )
    c = model.transform(feat).select(
        id_col, "c_vec", F.col("prediction").alias("bucket")
    )
    centers = np.vstack(model.clusterCenters())  # (n_centroids, dim) — tiny
    n_probe = min(nprobe, centers.shape[0])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _probes(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        # rank by squared euclidean: |x|^2 const per row -> -2x.c + |c|^2
        d = -2.0 * (X @ centers.T) + (centers * centers).sum(axis=1)[None, :]
        idx = np.argsort(d, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(idx))

    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("q_vec"),
        F.explode(_probes(F.col(vec_col))).alias("bucket"),
    )
    scored = q.join(c, "bucket").withColumn(
        "cosine",
        (
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
        ).cast("double"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


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
        F.col(id_col), F.col(vec_col).alias("c_vec"), sign_bucket(vec_col, hyper).alias("bucket")
    )
    q0 = queries.select(
        F.col(query_id), F.col(vec_col).alias("q_vec"), sign_bucket(vec_col, hyper).alias("bucket0")
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
