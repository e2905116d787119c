"""Spatial join + raster↔vector tiling (the graft's headline operators).

Design (BASELINE.json north_star): candidate generation by **cell equi join**
— points indexed at resolution ``res``, polygons expanded to their covering
cell set — then **exact refinement** with vectorized ray-casting inside an
Arrow-batched ``mapInPandas``.  This reuses the reference's spatial-locality
pattern (per-pixel partitioning + border replication, reference
main.cpp:226-238, 621-708): a polygon is "replicated" into every cell it
covers, exactly like the reference's border edges are written to both
incident pixels.

Scale notes: the candidate join is a plain equi join on ``cell`` — AQE
handles skew splitting; dense city-core cells can additionally be salted /
adaptively split (operators.skew).  Covering-cell expansion is pure column
arithmetic (sequence × sequence explode), so Catalyst pushes the whole
candidate stage into codegen; Python runs only in the final refinement over
candidate pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from navgraph_osm_spark.cells import cell_expr, cell_from_xy_expr, xy_expr
from navgraph_osm_spark.functions.geo import points_in_polygon_np


def assign_cells(df: DataFrame, res: int, lat: str = "lat", lng: str = "lng",
                 out: str = "cell") -> DataFrame:
    """Point rows → + hierarchical cell column (pure codegen, no Python)."""
    return df.withColumn(out, cell_expr(F.col(lat), F.col(lng), res))


def footprint_bbox(df: DataFrame, fp: str = "footprint") -> DataFrame:
    """Polygon rows → bbox columns via array higher-order functions."""
    lats = F.transform(F.col(fp), lambda p: p["lat"])
    lngs = F.transform(F.col(fp), lambda p: p["lng"])
    return (
        df.withColumn("lat_min", F.array_min(lats))
        .withColumn("lat_max", F.array_max(lats))
        .withColumn("lng_min", F.array_min(lngs))
        .withColumn("lng_max", F.array_max(lngs))
    )


def covering_cells(df: DataFrame, res: int, fp: str = "footprint",
                   out: str = "cell") -> DataFrame:
    """Explode each polygon row into its bbox-covering cell ids.

    This is the raster↔vector tiling primitive: for images, the footprint's
    covering cells ARE its tile assignments.  Pure column expressions.
    """
    df = footprint_bbox(df, fp)
    x0, y_at_latmax = xy_expr(F.col("lat_max"), F.col("lng_min"), res)
    x1, y_at_latmin = xy_expr(F.col("lat_min"), F.col("lng_max"), res)
    # y grows north→south: lat_max → smaller y
    df = (
        df.withColumn("cx", F.explode(F.sequence(x0, x1)))
        .withColumn("cy", F.explode(F.sequence(y_at_latmax, y_at_latmin)))
        .withColumn(out, cell_from_xy_expr(F.col("cx"), F.col("cy"), res))
        .drop("cx", "cy", "lat_min", "lat_max", "lng_min", "lng_max")
    )
    return df


def tile_assignment(images: DataFrame, res: int) -> DataFrame:
    """image_id → covering tile cells of its footprint (sorted, distinct)."""
    return (
        covering_cells(images.select("image_id", "footprint"), res)
        .select("image_id", "cell")
        .distinct()
    )


_REFINE_HELP_COLS = ("__plat", "__plng", "__fp_lat", "__fp_lng")


def _refine_kernel(id_cols: list[str]):
    """Kernel factory: exact point-in-polygon refinement over candidate pairs.

    Vectorizes over all points sharing a polygon within the Arrow batch;
    yields only the id columns of surviving pairs.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf[id_cols]
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            key = pdf["__fp_lat"].map(
                lambda a: np.asarray(a, dtype=np.float64).tobytes()
            )
            for _, idx in pdf.groupby(key, sort=False).groups.items():
                rows = pdf.loc[idx]
                fp_lat = np.asarray(rows["__fp_lat"].iloc[0], dtype=np.float64)
                fp_lng = np.asarray(rows["__fp_lng"].iloc[0], dtype=np.float64)
                keep[pdf.index.get_indexer(idx)] = points_in_polygon_np(
                    rows["__plat"].to_numpy(), rows["__plng"].to_numpy(), fp_lat, fp_lng
                )
            yield pdf.loc[keep, id_cols]

    return _kernel


def _refine_kernel_broadcast(id_cols: list[str], poly_bc):
    """Refinement with the polygon table shipped once per executor (broadcast)
    instead of per candidate row — the polygon side is a dim table (the
    reference's restriction-broadcast pattern, SURVEY.md §2.3 J8/J9)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = poly_bc.value
        pid_col = id_cols[1]
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf[id_cols]
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for pid, idx in pdf.groupby(pid_col, sort=False).groups.items():
                fp_lat, fp_lng = polys[pid]
                rows = pdf.loc[idx]
                keep[pdf.index.get_indexer(idx)] = points_in_polygon_np(
                    rows["__plat"].to_numpy(), rows["__plng"].to_numpy(), fp_lat, fp_lng
                )
            yield pdf.loc[keep, id_cols]

    return _kernel


BROADCAST_POLY_LIMIT = 200_000


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int,
    point_id: str = "point_id",
    poly_id: str = "poly_id",
    lat: str = "lat",
    lng: str = "lng",
    fp: str = "footprint",
    exact: bool = True,
    broadcast_polys: bool | None = None,
) -> DataFrame:
    """Points ⋈ polygons containment join.

    Candidates: equi join on cell (point cell vs polygon covering cells);
    refinement: exact ray casting in mapInPandas (skippable for bbox-only
    semantics with ``exact=False``).

    When the polygon side is dim-sized (≤ ``BROADCAST_POLY_LIMIT`` rows, the
    common raster↔vector case), its vertices are broadcast to the refinement
    kernel so candidate rows carry only ids + the point coordinates — arrays
    never cross Arrow per row.  Set ``broadcast_polys=False`` to force the
    carry-along path (arbitrarily large polygon tables).
    """
    sc = points.sparkSession.sparkContext
    pts = assign_cells(points.select(point_id, lat, lng), res, lat, lng)
    polys = covering_cells(polygons.select(poly_id, fp), res, fp)
    if broadcast_polys is None:
        broadcast_polys = polygons.count() <= BROADCAST_POLY_LIMIT

    base_cols = [
        F.col(point_id),
        F.col(poly_id),
        F.col(lat).alias("__plat"),
        F.col(lng).alias("__plng"),
    ]
    if not broadcast_polys:
        base_cols += [
            F.transform(F.col(fp), lambda p: p["lat"]).alias("__fp_lat"),
            F.transform(F.col(fp), lambda p: p["lng"]).alias("__fp_lng"),
        ]
    cand = pts.join(polys, "cell").select(*base_cols)
    if not exact:
        return cand.select(point_id, poly_id).distinct()
    # candidate pairs inherit the cell join's skew (dense city-core cells →
    # one fat partition → serial python tail); refinement is row-independent,
    # so rebalance before the python stage (north_rule skew handling — the
    # join itself is covered by AQE skew splitting).  Partitioning by
    # (poly_id, salt) keeps each Arrow batch dense in few polygons (the
    # kernel vectorizes per polygon) while the salt caps per-polygon skew.
    cand = cand.repartition(
        sc.defaultParallelism * 2,
        F.col(poly_id),
        F.pmod(F.xxhash64(point_id), F.lit(16)),
    )
    dtypes = dict(cand.dtypes)
    out_schema = f"{point_id} {dtypes[point_id]}, {poly_id} {dtypes[poly_id]}"
    if broadcast_polys:
        poly_map = {
            r[poly_id]: (
                np.array([p["lat"] for p in r[fp]], dtype=np.float64),
                np.array([p["lng"] for p in r[fp]], dtype=np.float64),
            )
            for r in polygons.select(poly_id, fp).collect()
        }
        kernel = _refine_kernel_broadcast([point_id, poly_id], sc.broadcast(poly_map))
    else:
        kernel = _refine_kernel([point_id, poly_id])
    refined = cand.mapInPandas(kernel, schema=out_schema)
    return refined.distinct()
