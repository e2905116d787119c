"""Skew handling: salted repartition + adaptive cell splitting.

Dense city-core cells mirror the reference's dense HEALPix pixels — its only
mitigation was largest-buffer eviction in the partitioned sink (reference
include/disk/key-file-cluster-write.hpp:31-80).  Here (north_rule):

- ``salted_repartition`` — split a hot key into ``(key, salt)`` shards.
- ``adaptive_cell_split`` — re-index rows in over-dense cells at a finer
  resolution (cell → children, repeatedly), driven by a cheap pre-agg;
  the hierarchy makes the split loss-free (parent recoverable by shifting).
- AQE's skew-join splitting handles residual join skew
  (spark.sql.adaptive.skewJoin.enabled=true in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from navgraph_osm_spark.cells import cell_expr


def cell_histogram(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    return df.groupBy(cell_col).agg(F.count("*").alias("n_rows"))


def salted_repartition(df: DataFrame, key: str, salt_buckets: int, partitions: int | None = None) -> DataFrame:
    """Append a deterministic salt derived from a row hash; repartition on
    (key, salt) so one hot key spreads over ``salt_buckets`` tasks."""
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    n = partitions or salted.sparkSession.sparkContext.defaultParallelism
    return salted.repartition(n, F.col(key), F.col("salt"))


def adaptive_cell_split(
    df: DataFrame,
    res: int,
    threshold: int,
    max_extra_levels: int = 4,
    lat: str = "lat",
    lng: str = "lng",
    cell_col: str = "part_cell",
) -> DataFrame:
    """Assign each row a partition cell: base ``res``, but rows in cells with
    more than ``threshold`` rows descend to finer resolutions (children)
    until every partition cell is under the threshold or ``max_extra_levels``
    is exhausted.

    Implementation: encode once at the finest resolution, then derive every
    coarser id by shifting — the density decision is a broadcast join against
    a small per-cell histogram computed level by level (driver loop over at
    most ``max_extra_levels`` cheap aggs, never over rows).
    """
    finest = res + max_extra_levels
    out = df.withColumn("__finest", cell_expr(F.col(lat), F.col(lng), finest))
    out = out.withColumn(cell_col, F.shiftright(F.col("__finest"), 2 * max_extra_levels))

    for level in range(max_extra_levels):
        hist = out.groupBy(cell_col).agg(F.count("*").alias("__n"))
        dense = hist.filter(F.col("__n") > threshold).select(
            F.col(cell_col).alias("__dense_cell")
        )
        if dense.isEmpty():
            break
        shift = 2 * (max_extra_levels - level - 1)
        out = (
            out.join(
                F.broadcast(dense),
                out[cell_col] == F.col("__dense_cell"),
                "left",
            )
            .withColumn(
                cell_col,
                F.when(
                    F.col("__dense_cell").isNotNull(),
                    F.shiftright(F.col("__finest"), shift),
                ).otherwise(F.col(cell_col)),
            )
            .drop("__dense_cell")
        )
    return out.drop("__finest")
