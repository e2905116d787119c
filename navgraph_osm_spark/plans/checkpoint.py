"""Checkpoint-resumable stage runner with per-partition lineage + metrics.

The reference materializes every stage boundary as typed binary partition
files and unlinks them as consumed (reference main.cpp:95-127, 291, 336) —
its filesystem IS its shuffle and its (non-resumable) checkpoint.  Here each
registered stage writes a managed table (Iceberg when available, else
Parquet) plus a ``_lineage.json`` sidecar: row count, per-partition-column
counts, input stage names, wall time.  ``run()`` skips stages whose output
already exists and validates — that is the north_rule's checkpoint-resume.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navgraph_osm_spark.sources.tables import TableWriter


@dataclass
class Stage:
    name: str
    fn: Callable[[dict[str, DataFrame]], DataFrame]
    inputs: list[str] = field(default_factory=list)
    partition_by: list[str] | None = None


class StageRunner:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.writer = TableWriter(spark, warehouse)
        self.stages: list[Stage] = []

    def stage(
        self,
        name: str,
        fn: Callable[[dict[str, DataFrame]], DataFrame],
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> None:
        self.stages.append(Stage(name, fn, inputs or [], partition_by))

    def _lineage_path(self, name: str) -> str:
        return os.path.join(self.writer.warehouse, f"{name}._lineage.json")

    def _valid(self, name: str) -> bool:
        if not self.writer.exists(name):
            return False
        lp = self._lineage_path(name)
        if not os.path.exists(lp):
            return False
        with open(lp) as f:
            lineage = json.load(f)
        try:
            return self.writer.read(name).count() == lineage["rows"]
        except Exception:
            return False

    def run(self, resume: bool = True) -> dict[str, DataFrame]:
        """Execute all stages in order; resume skips validated outputs.

        A stage is only skipped when its own output validates AND none of
        its inputs were recomputed earlier in this run — otherwise a
        repaired upstream stage would silently feed stale downstream tables.
        Recomputation is detected both in-run (the ``recomputed`` set) and
        across runs (each lineage sidecar records the input tables' row
        counts at build time; a mismatch against the inputs' current counts
        forces re-execution).
        """
        results: dict[str, DataFrame] = {}
        recomputed: set[str] = set()
        input_rows: dict[str, int] = {}  # rows of each completed stage

        def _stage_rows(name: str) -> int:
            if name not in input_rows:
                input_rows[name] = self.writer.read(name).count()
            return input_rows[name]

        for st in self.stages:
            fresh_inputs = not (set(st.inputs) & recomputed)
            stale_lineage = False
            if resume and fresh_inputs and self._valid(st.name):
                with open(self._lineage_path(st.name)) as f:
                    lineage = json.load(f)
                recorded = lineage.get("input_rows", {})
                stale_lineage = any(
                    recorded.get(dep) != _stage_rows(dep) for dep in st.inputs
                )
                if not stale_lineage:
                    out = self.writer.read(st.name)
                    input_rows[st.name] = lineage["rows"]
                    results[st.name] = out
                    continue
            t0 = time.time()
            deps = {k: results[k] for k in st.inputs}
            df = st.fn(deps)
            self.writer.write(df, st.name, partition_by=st.partition_by)
            out = self.writer.read(st.name)
            recomputed.add(st.name)
            n_rows = out.count()
            input_rows[st.name] = n_rows
            lineage = {
                "stage": st.name,
                "inputs": st.inputs,
                "input_rows": {dep: _stage_rows(dep) for dep in st.inputs},
                "rows": n_rows,
                "wall_s": round(time.time() - t0, 3),
                "partition_by": st.partition_by,
            }
            if st.partition_by:
                per_part = (
                    out.groupBy(*st.partition_by)
                    .agg(F.count("*").alias("n"))
                    .orderBy(*st.partition_by)
                    .limit(10000)
                    .collect()
                )
                lineage["partitions"] = [
                    {**{c: str(r[c]) for c in st.partition_by}, "rows": r["n"]}
                    for r in per_part
                ]
            with open(self._lineage_path(st.name), "w") as f:
                json.dump(lineage, f, indent=1)
            results[st.name] = out
        return results
