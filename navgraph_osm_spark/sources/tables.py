"""Table IO: driver-testdata loading + an Iceberg-or-Parquet writer facade.

The engine targets Iceberg tables (BASELINE.json north_star); the Iceberg
runtime jar is not in this sandbox, so the writer abstraction probes for it
and falls back to partitioned Parquet with identical call sites — swapping in
Iceberg on a real cluster is a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DRIVER_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in DRIVER_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableWriter:
    """Write a DataFrame as a (possibly cell-partitioned) managed table.

    Iceberg when the runtime is on the classpath, else partitioned Parquet.
    This is the engine's analogue of the reference's per-key partitioned
    binary sink (reference include/disk/key-file-cluster-write.hpp:31-114) —
    Spark's shuffle writer supplies the buffering/eviction the reference
    hand-rolled.
    """

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.use_iceberg = iceberg_available(spark)

    def path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def write(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None, mode: str = "overwrite"
    ) -> str:
        target = self.path(name)
        if self.use_iceberg:
            writer = df.writeTo(f"local.{name}")
            if partition_by:
                writer = writer.partitionedBy(*partition_by)
            writer.createOrReplace()
        else:
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(target)
            # drop any cached file listing from earlier reads of this path —
            # an overwrite otherwise leaves readers pointing at deleted files
            self.spark.catalog.refreshByPath(target)
        return target

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(f"local.{name}")
        return self.spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"local.{name}")
        target = self.path(name)
        return os.path.isdir(target) and any(
            f.startswith("_SUCCESS") for f in os.listdir(target)
        )
