"""HEALPix RING index: hand-computed values, numpy/expr/SQL agreement,
and the equal-area property the Morton grid lacks."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from navgraph_osm_spark import healpix as hp


def test_nside1_hand_values():
    """nside=1: 12 pixels — 0-3 north cap, 4-7 equatorial, 8-11 south cap."""
    lat = np.array([89.9, 89.9, 0.0, -89.9])
    lng = np.array([45.0, 135.0, 0.0, 45.0])
    assert hp.ang2pix_ring_np(lat, lng, 1).tolist() == [0, 1, 4, 8]


def test_nside1_full_coverage():
    """A dense grid hits every one of the 12 base pixels exactly."""
    lat, lng = np.meshgrid(np.linspace(-89, 89, 60), np.linspace(-179, 179, 120))
    pix = hp.ang2pix_ring_np(lat.ravel(), lng.ravel(), 1)
    assert set(pix.tolist()) == set(range(12))


def _sphere_sample(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    z = rng.uniform(-1, 1, n)  # uniform in z == uniform on the sphere
    lat = np.degrees(np.arcsin(z))
    lng = rng.uniform(-180, 180, n)
    return lat, lng


def test_equal_area_occupancy():
    """Uniform-on-sphere points land ~uniformly across pixels (the property
    the reference's partitioner relies on; equirect Morton cells fail this
    poleward)."""
    lat, lng = _sphere_sample()
    nside = 4
    pix = hp.ang2pix_ring_np(lat, lng, nside)
    assert pix.min() >= 0 and pix.max() < hp.npix(nside)
    counts = np.bincount(pix, minlength=hp.npix(nside))
    expect = len(lat) / hp.npix(nside)
    # all 192 pixels occupied, none more than ~2x the mean (Poisson bounds)
    assert counts.min() > 0
    assert counts.max() < 2.0 * expect


def test_expr_matches_numpy(spark):
    lat, lng = _sphere_sample(5000)
    pdf = pd.DataFrame({"i": np.arange(lat.size), "lat": lat, "lng": lng})
    df = spark.createDataFrame(pdf)
    for nside in (1, 4, hp.N_SIDE_REFERENCE):
        got = (
            df.select("i", hp.ang2pix_ring_expr(F.col("lat"), F.col("lng"), nside).alias("p"))
            .toPandas()
            .sort_values("i")["p"]
            .to_numpy()
        )
        assert (got == hp.ang2pix_ring_np(lat, lng, nside)).all()


def test_sql_matches_numpy():
    lat, lng = _sphere_sample(5000, seed=9)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"i": np.arange(lat.size), "lat": lat, "lng": lng}))
    for nside in (1, hp.N_SIDE_REFERENCE):
        got = con.execute(
            f"SELECT {hp.ang2pix_ring_sql('lat', 'lng', nside)} AS p FROM pts ORDER BY i"
        ).df()["p"].to_numpy()
        assert (got == hp.ang2pix_ring_np(lat, lng, nside)).all()


def test_poles_and_boundaries():
    """Exact poles, the z=2/3 band boundary, and the lng wrap all produce
    in-range pixels and agree across numpy/expr paths."""
    lat = np.array([90.0, -90.0, 41.8103148957786, -41.8103148957786, 0.0, 0.0])
    lng = np.array([0.0, 0.0, 0.0, 359.999999, -180.0, 180.0])
    for nside in (1, 2, 50):
        pix = hp.ang2pix_ring_np(lat, lng, nside)
        assert (pix >= 0).all() and (pix < hp.npix(nside)).all()
        # lng -180 and +180 are the same meridian
        assert pix[4] == pix[5]


def test_assign_healpix_plan_stays_jvm(spark):
    """The assign is pure column arithmetic — no Python eval in the plan."""
    import contextlib
    import io

    import navgraph_osm_spark.queries as Q

    df = hp.assign_healpix(Q.points_df(spark, "/root/testdata/sf0.001"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    assert "EvalPython" not in buf.getvalue()
