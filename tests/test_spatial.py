"""Spatial join, tiling, kNN vs engine-independent numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from navgraph_osm_spark import cells
from navgraph_osm_spark.functions.geo import haversine_np, points_in_polygon_np
from navgraph_osm_spark.operators.knn import knn_join, knn_join_bruteforce, min_ring_for_radius
from navgraph_osm_spark.operators.spatial_join import (
    covering_cells,
    point_in_polygon_join,
    tile_assignment,
)

RES = 12


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(400, dtype=np.int64),
            "lat": rng.uniform(48.0, 49.5, 400),
            "lng": rng.uniform(1.5, 3.5, 400),
        }
    )
    return spark.createDataFrame(pdf), pdf


@pytest.fixture(scope="module")
def polygons(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(30):
        clat = rng.uniform(48.2, 49.3)
        clng = rng.uniform(1.7, 3.3)
        r = rng.uniform(0.02, 0.25)
        nv = int(rng.integers(3, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rows.append(
            {
                "poly_id": i,
                "footprint": [
                    {"lat": clat + r * np.sin(a), "lng": clng + r * np.cos(a)}
                    for a in ang
                ],
            }
        )
    schema = "poly_id long, footprint array<struct<lat:double,lng:double>>"
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema), rows


def test_covering_cells_contain_polygon_cells(spark, polygons):
    poly_df, rows = polygons
    got = covering_cells(poly_df, RES).select("poly_id", "cell").toPandas()
    by_poly = got.groupby("poly_id")["cell"].apply(set)
    for r in rows:
        lats = np.array([p["lat"] for p in r["footprint"]])
        lngs = np.array([p["lng"] for p in r["footprint"]])
        vert_cells = set(cells.latlng_to_cell(lats, lngs, RES).tolist())
        assert vert_cells <= by_poly[r["poly_id"]], r["poly_id"]


def test_pip_join_matches_numpy_oracle(points, polygons):
    pts_df, pts_pdf = points
    poly_df, rows = polygons
    got = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon_join(pts_df, poly_df, RES).collect()
    }
    want = set()
    for r in rows:
        inside = points_in_polygon_np(
            pts_pdf["lat"].to_numpy(),
            pts_pdf["lng"].to_numpy(),
            np.array([p["lat"] for p in r["footprint"]]),
            np.array([p["lng"] for p in r["footprint"]]),
        )
        want |= {(int(pid), r["poly_id"]) for pid in pts_pdf["point_id"][inside]}
    assert got == want
    assert len(want) > 0


def test_pip_bbox_superset(points, polygons):
    pts_df, _ = points
    poly_df, _ = polygons
    exact = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon_join(pts_df, poly_df, RES, exact=True).collect()
    }
    coarse = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon_join(pts_df, poly_df, RES, exact=False).collect()
    }
    assert exact <= coarse


def test_tile_assignment_oracle(spark):
    from navgraph_osm_spark.sources.synth import gen_images

    imgs = gen_images(spark, 200, seed=42, partitions=4)
    got = tile_assignment(imgs, RES).toPandas()
    rows = imgs.select("image_id", "footprint").collect()
    for r in rows[:50]:
        lats = np.array([p["lat"] for p in r["footprint"]])
        lngs = np.array([p["lng"] for p in r["footprint"]])
        x0, y1 = cells.latlng_to_xy(lats.max(), lngs.min(), RES)
        x1, y0 = cells.latlng_to_xy(lats.min(), lngs.max(), RES)
        want = {
            int(cells.xy_to_cell(np.array([x]), np.array([y]), RES)[0])
            for x in range(int(x0), int(x1) + 1)
            for y in range(int(y1), int(y0) + 1)
        }
        got_cells = set(got[got["image_id"] == r["image_id"]]["cell"].tolist())
        assert got_cells == want, r["image_id"]


def test_knn_ring_matches_bruteforce(points, spark):
    pts_df, pts_pdf = points
    queries = pts_df.limit(25).select(
        F.col("point_id").alias("query_id"), "lat", "lng"
    )
    k = 5
    # points span ~1.5deg; at RES=12 a big ring guarantees exactness
    ring = min_ring_for_radius(40.0, RES, lat_deg=49.0)
    got = knn_join(pts_df, queries, k, RES, ring=ring).toPandas()
    want = knn_join_bruteforce(pts_df, queries, k).toPandas()
    gs = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    ws = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gs, ws, check_exact=False, rtol=1e-12)


def test_knn_bruteforce_matches_numpy(points):
    pts_df, pdf = points
    queries = pts_df.limit(5).select(F.col("point_id").alias("query_id"), "lat", "lng")
    got = knn_join_bruteforce(pts_df, queries, 3).toPandas()
    for qid, grp in got.groupby("query_id"):
        q = pdf[pdf["point_id"] == qid].iloc[0]
        d = haversine_np(q["lat"], q["lng"], pdf["lat"].to_numpy(), pdf["lng"].to_numpy())
        order = np.lexsort((pdf["point_id"].to_numpy(), d))[:3]
        assert grp.sort_values("rank")["point_id"].tolist() == pdf["point_id"].to_numpy()[order].tolist()
