"""CSV sink: expanded-edge graph → reference-shaped CSV rows.

Reproduces the reference's export (reference include/csv/generate.hpp:19-542;
row shape :44-56, emit :238-263,463-488): per expanded edge a row

    weight, geom, was_one_way, osm_way_from, osm_way_to,
    osm_way_from_source_node, osm_way_from_target_node,
    osm_way_to_source_node, osm_way_to_target_node

where ``geom`` is ``LINESTRING(lon lat;lon lat;…)`` (';'-separated,
"lon lat" order, 6 decimals) running midpoint(source edge) → shared via
node → midpoint(target edge) (reference generate.hpp:187-216, midpoints
geomath.cpp:77-97).

J10's offset joins become two DataFrame joins on edge id; the geometry
midpoint interpolation runs in one Arrow-batched pandas UDF; the final
string assembly is ``format_number``/``concat_ws`` column expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from navgraph_osm_spark.functions.geo import find_middle_point_np

_HALF_SCHEMA = "edge_id long, half_out array<struct<lat:double,lng:double>>, half_in array<struct<lat:double,lng:double>>"


def _halves_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per edge: polyline from its midpoint to its end (``half_out``) and
    from its start to its midpoint (``half_in``)."""
    for pdf in batches:
        out_rows = []
        for edge_id, geom in zip(pdf["edge_id"], pdf["geom"]):
            lats = np.array([p["lat"] for p in geom])
            lngs = np.array([p["lng"] for p in geom])
            mlat, mlng = find_middle_point_np(lats, lngs)
            legs = np.hypot(np.diff(lats), np.diff(lngs))
            cum = np.concatenate(([0.0], np.cumsum(legs)))
            half = cum[-1] / 2.0
            i = int(np.searchsorted(cum, half, side="right"))
            mid = {"lat": mlat, "lng": mlng}
            pts = [{"lat": float(a), "lng": float(b)} for a, b in zip(lats, lngs)]
            out_rows.append(
                {
                    "edge_id": edge_id,
                    "half_out": [mid] + pts[i:],
                    "half_in": pts[:i] + [mid],
                }
            )
        yield pd.DataFrame(out_rows, columns=["edge_id", "half_out", "half_in"])


def export_rows(edges: DataFrame, exp_edges: DataFrame) -> DataFrame:
    """Expanded edges joined to edge geometry, with formatted LINESTRING."""
    halves = edges.select("edge_id", "geom").mapInPandas(_halves_kernel, schema=_HALF_SCHEMA)
    src = edges.select(
        F.col("edge_id").alias("src_edge_id"),
        F.col("oneway").alias("src_oneway"),
        F.col("src_node").alias("from_source_node"),
        F.col("tgt_node").alias("from_target_node"),
    ).join(halves.select(F.col("edge_id").alias("src_edge_id"), "half_out"), "src_edge_id")
    tgt = edges.select(
        F.col("edge_id").alias("tgt_edge_id"),
        F.col("src_node").alias("to_source_node"),
        F.col("tgt_node").alias("to_target_node"),
    ).join(halves.select(F.col("edge_id").alias("tgt_edge_id"), "half_in"), "tgt_edge_id")

    joined = exp_edges.join(src, "src_edge_id").join(tgt, "tgt_edge_id")
    # geometry: midpoint(src)…via…midpoint(tgt); drop the duplicated via point
    line = F.concat(
        F.col("half_out"), F.slice(F.col("half_in"), 2, F.greatest(F.size("half_in") - 1, F.lit(0)))
    )
    geom_str = F.concat(
        F.lit("LINESTRING("),
        F.concat_ws(
            ";",
            F.transform(
                line,
                lambda p: F.concat_ws(
                    " ",
                    F.format_number(p["lng"], 6),
                    F.format_number(p["lat"], 6),
                ),
            ),
        ),
        F.lit(")"),
    )
    src_mid = F.element_at(F.col("half_out"), 1)
    tgt_mid = F.element_at(F.col("half_in"), -1)
    return joined.select(
        F.col("cost").alias("weight"),
        geom_str.alias("geom"),
        F.col("src_oneway").cast("int").alias("was_one_way"),
        F.col("from_way").alias("osm_way_from"),
        F.col("to_way").alias("osm_way_to"),
        "from_source_node",
        "from_target_node",
        "to_source_node",
        "to_target_node",
        src_mid["lat"].alias("src_mid_lat"),
        src_mid["lng"].alias("src_mid_lng"),
        tgt_mid["lat"].alias("tgt_mid_lat"),
        tgt_mid["lng"].alias("tgt_mid_lng"),
    )


def write_csv(edges: DataFrame, exp_edges: DataFrame, path: str) -> None:
    export_rows(edges, exp_edges).write.mode("overwrite").option("header", True).csv(path)
