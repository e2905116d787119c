"""Streaming spatial operators: stream-static geofencing.

The production shape for a moving-object feed (vehicle pings, AIS
positions, photo uploads) against a static zone table: the polygon side is
a dim table whose covering cells + broadcast vertices are planned ONCE;
the point stream gets its cell in codegen; candidates come from a
stream-static equi join on ``cell`` (stateless — no stream state, no
watermark needed for the join itself); refinement reuses the batch PIP
kernel unchanged.  Late data only matters at the windowed AGGREGATION,
where a watermark bounds state.

Everything here composes the batch operators — the join is literally
:func:`operators.spatial_join.point_in_polygon_join` applied to a
streaming DataFrame (its candidate work is stateless projections/joins,
legal in Structured Streaming; the polygon-side probe/collect runs at
plan time on the static side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from navgraph_osm_spark.operators.spatial_join import point_in_polygon_join


def streaming_geofence_join(
    points_stream: DataFrame,
    polygons: DataFrame,
    res: int,
    point_id: str = "point_id",
    poly_id: str = "poly_id",
    ts: str = "ts",
) -> DataFrame:
    """Streaming points ⋈ static polygons: one output row per (point,
    containing polygon) with the event time carried through.

    The rectangle fast path stays pure codegen on the stream; non-rect
    polygons refine through the broadcast Arrow kernel (the static side
    satisfies the dim-table contract by construction — zones are
    thousands, not billions).  Output is append-safe: stateless, no
    aggregation state.
    """
    return point_in_polygon_join(
        points_stream,
        polygons,
        res,
        point_id=point_id,
        poly_id=poly_id,
        carry=(ts,),
    )


def geofence_window_counts(
    matched: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    poly_id: str = "poly_id",
    ts: str = "ts",
) -> DataFrame:
    """Tumbling-window occupancy per zone over the geofence join output —
    late pings beyond ``watermark`` are dropped, state stays bounded by
    (zones × open windows)."""
    return (
        matched.withWatermark(ts, watermark)
        .groupBy(F.window(ts, window).alias("w"), poly_id)
        .agg(F.count("*").alias("n_points"))
        .select(F.col("w.start").alias("window_start"), poly_id, "n_points")
    )
