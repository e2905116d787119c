"""Property-based tests (hypothesis) for the cell index and geo kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from navgraph_osm_spark import cells
from navgraph_osm_spark.functions.geo import haversine_np

lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lng_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
res_s = st.integers(min_value=0, max_value=cells.MAX_RES)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lng=lng_s, res=res_s)
def test_cell_contains_its_point(lat, lng, res):
    c = cells.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    assert cells.cell_res(c)[0] == res
    lo, hi, lgo, lgh = cells.cell_bounds(c)
    # clamped edges (lat=±90, lng=180) may sit on the boundary cell
    assert lo[0] - 1e-9 <= min(lat, 90.0 - 1e-12) or lat <= hi[0] + 1e-9
    assert lo[0] - 180.0 / (1 << res) <= lat <= hi[0] + 180.0 / (1 << res)
    assert lgo[0] - 360.0 / (1 << res) <= lng <= lgh[0] + 360.0 / (1 << res)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lng=lng_s, res=st.integers(min_value=1, max_value=cells.MAX_RES))
def test_parent_is_ancestor(lat, lng, res):
    child = cells.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    parent = cells.latlng_to_cell(np.array([lat]), np.array([lng]), res - 1)
    assert cells.cell_parent(child)[0] == parent[0]
    assert cells.is_ancestor(parent, child)[0]


@settings(max_examples=100, deadline=None)
@given(lat1=lat_s, lng1=lng_s, lat2=lat_s, lng2=lng_s)
def test_haversine_metric_properties(lat1, lng1, lat2, lng2):
    d12 = haversine_np(lat1, lng1, lat2, lng2)
    d21 = haversine_np(lat2, lng2, lat1, lng1)
    assert abs(d12 - d21) < 1e-9          # symmetry
    assert d12 >= 0.0                     # non-negativity
    assert haversine_np(lat1, lng1, lat1, lng1) < 1e-9  # identity
    # bounded by half the great circle
    assert d12 <= np.pi * 6370.986884258304 + 1e-6


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lng=lng_s, k=st.integers(min_value=1, max_value=3))
def test_grid_disk_contains_center_and_bounded(lat, lng, k):
    res = 8
    c = int(cells.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0])
    disk = cells.grid_disk_np(c, k)
    assert c in disk
    assert 1 <= len(disk) <= (2 * k + 1) ** 2
    assert (cells.cell_res(disk) == res).all()
