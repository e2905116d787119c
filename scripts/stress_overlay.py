"""Overlay-join stress: 10k x 10k heavily-overlapping random polygons.

Reproduces the round-4 ad-hoc stress (ROUND4.md: 5,100 pairs, 8.2 s at
local[16]) as a checked-in A/B harness for the refinement kernel.  Prints
one JSON line: {"pairs": N, "wall_s": S, "cpus": C}.

Usage: python scripts/stress_overlay.py [n_a] [n_b] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_polys(rng, n, id0, spread=3.0):
    rows = []
    clats = rng.uniform(48.2, 48.2 + spread, n)
    clngs = rng.uniform(1.7, 1.7 + spread * 1.5, n)
    radii = rng.uniform(0.02, 0.3, n)
    nvs = rng.integers(3, 8, n)
    for i in range(n):
        ang = np.sort(rng.uniform(0, 2 * np.pi, nvs[i]))
        rows.append({
            "pid": id0 + i,
            "footprint": [
                {"lat": float(clats[i] + radii[i] * np.sin(t)),
                 "lng": float(clngs[i] + radii[i] * np.cos(t))}
                for t in ang
            ],
        })
    return rows


def main():
    n_a = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spread = float(sys.argv[4]) if len(sys.argv) > 4 else 3.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .appName("stress_overlay")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from navgraph_osm_spark.operators.spatial_join import polygon_intersection_join

    rng = np.random.default_rng(77)
    schema = "pid long, footprint array<struct<lat:double,lng:double>>"
    A = (
        spark.createDataFrame(pd.DataFrame(make_polys(rng, n_a, 0, spread)), schema)
        .withColumnRenamed("pid", "a_id")
        .localCheckpoint(eager=True)
    )
    B = (
        spark.createDataFrame(pd.DataFrame(make_polys(rng, n_b, 1_000_000, spread)), schema)
        .withColumnRenamed("pid", "b_id")
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    n = polygon_intersection_join(A, B, res=10).count()
    wall = time.time() - t0
    print(json.dumps({"pairs": n, "wall_s": round(wall, 3), "cpus": cpus, "spread": spread}))
    spark.stop()


if __name__ == "__main__":
    main()
