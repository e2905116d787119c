"""Geodesic + planar geometry functions.

Column-expression implementations of the reference's scalar geometry library
(reference: include/utils/geomath.cpp) so the hot path stays JVM-side:

- ``haversine_expr``  ↔ ``geopointsDistance`` (geomath.cpp:7-21), including
  the reference's idiosyncratic ``EARTH_RADIUS = 6370.986884258304`` km
  (geomath.hpp:6) so costs match the reference bit-for-bit semantics.
- ``haversine_sql``   — the same formula as ANSI SQL text for DuckDB oracles.
- ``polyline_cost_expr`` ↔ ``wayCost`` (geomath.cpp:23-46) via the
  ``aggregate`` higher-order function over an inline geometry array.
- numpy versions (suffix ``_np``) for pandas-UDF composition and tests.
- ``find_middle_point_np`` ↔ ``findMiddlePoint`` (geomath.cpp:77-97):
  point at half the *Euclidean* polyline length by linear interpolation.
- ``points_in_polygon_np`` — vectorized ray-casting point-in-polygon
  (the exact-refinement kernel for the spatial join; the reference has no
  polygon ops — this is graft functionality per BASELINE.json).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6370.986884258304  # reference include/utils/geomath.hpp:6


def haversine_expr(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in km (reference geomath.cpp:7-21)."""
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lng2 - lng1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlmb / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1.0 - a))


def haversine_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """DuckDB/ANSI SQL text computing the identical haversine value."""
    phi1, phi2 = f"radians({lat1})", f"radians({lat2})"
    dphi, dlmb = f"radians({lat2} - {lat1})", f"radians({lng2} - {lng1})"
    a = (
        f"(pow(sin(({dphi})/2), 2) + cos({phi1}) * cos({phi2}) * "
        f"pow(sin(({dlmb})/2), 2))"
    )
    return f"(2.0 * {EARTH_RADIUS_KM!r} * atan2(sqrt({a}), sqrt(1.0 - {a})))"


def haversine_np(lat1, lng1, lat2, lng2) -> np.ndarray:
    lat1, lng1, lat2, lng2 = (np.asarray(v, dtype=np.float64) for v in (lat1, lng1, lat2, lng2))
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    dphi, dlmb = np.radians(lat2 - lat1), np.radians(lng2 - lng1)
    a = np.sin(dphi / 2) ** 2 + np.cos(phi1) * np.cos(phi2) * np.sin(dlmb / 2) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))


def polyline_cost_expr(geom: Column) -> Column:
    """Sum of haversine leg lengths over ``array<struct<lat,lng>>``.

    Reference ``wayCost`` (geomath.cpp:23-46) re-expressed with the
    ``aggregate``/``zip_with`` higher-order functions — no Python.
    """
    legs = F.zip_with(
        F.slice(geom, 1, F.size(geom) - 1),
        F.slice(geom, 2, F.size(geom) - 1),
        lambda p, q: _haversine_hof(p["lat"], p["lng"], q["lat"], q["lng"]),
    )
    return F.aggregate(legs, F.lit(0.0), lambda acc, v: acc + v)


def _haversine_hof(lat1, lng1, lat2, lng2):
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lng2 - lng1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlmb / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1.0 - a))


# ---------------------------------------------------------------------------
# numpy geometry kernels (used inside Arrow-batched pandas UDFs and tests)
# ---------------------------------------------------------------------------

def polyline_euclidean_lengths_np(lats: np.ndarray, lngs: np.ndarray) -> np.ndarray:
    """Per-leg planar lengths (reference findDistance, geomath.cpp:48-53)."""
    return np.hypot(np.diff(lats), np.diff(lngs))


def find_middle_point_np(lats: np.ndarray, lngs: np.ndarray) -> tuple[float, float]:
    """Point at half the Euclidean polyline length (geomath.cpp:77-97)."""
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    if lats.size == 1:
        return float(lats[0]), float(lngs[0])
    legs = polyline_euclidean_lengths_np(lats, lngs)
    total = legs.sum()
    if total == 0.0:
        return float(lats[0]), float(lngs[0])
    half = total / 2.0
    cum = np.concatenate(([0.0], np.cumsum(legs)))
    i = int(np.searchsorted(cum, half, side="right") - 1)
    i = min(i, legs.size - 1)
    frac = (half - cum[i]) / legs[i] if legs[i] > 0 else 0.0
    return (
        float(lats[i] + (lats[i + 1] - lats[i]) * frac),
        float(lngs[i] + (lngs[i + 1] - lngs[i]) * frac),
    )


def _orient_np(ax, ay, bx, by, cx, cy):
    """Sign of the cross product (b-a) × (c-a), broadcastable."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def polygons_intersect_np(
    a_lat: np.ndarray, a_lng: np.ndarray, b_lat: np.ndarray, b_lng: np.ndarray
) -> bool:
    """Do two simple polygons overlap?  True iff any vertex of one lies in
    the other (even-odd interior) OR any edge pair properly crosses.

    Boundary semantics are the half-open even-odd convention of
    :func:`points_in_polygon_np`: a polygon's low-side edges are closed,
    so axis-aligned neighbors sharing an edge or corner report True
    through the closed side (consistent with the closed-interval bbox
    prefilter of the overlay join).  Vectorized: the edge-pair test is one
    broadcasted orientation check over all |A|×|B| segment pairs.
    """
    a_lat = np.asarray(a_lat, dtype=np.float64)
    a_lng = np.asarray(a_lng, dtype=np.float64)
    b_lat = np.asarray(b_lat, dtype=np.float64)
    b_lng = np.asarray(b_lng, dtype=np.float64)
    if points_in_polygon_np(a_lat, a_lng, b_lat, b_lng).any():
        return True
    if points_in_polygon_np(b_lat, b_lng, a_lat, a_lng).any():
        return True
    # closed edge lists
    ax1, ay1 = a_lng, a_lat
    ax2, ay2 = np.roll(a_lng, -1), np.roll(a_lat, -1)
    bx1, by1 = b_lng, b_lat
    bx2, by2 = np.roll(b_lng, -1), np.roll(b_lat, -1)
    # broadcast A edges (m,1) vs B edges (1,n)
    o1 = _orient_np(ax1[:, None], ay1[:, None], ax2[:, None], ay2[:, None],
                    bx1[None, :], by1[None, :])
    o2 = _orient_np(ax1[:, None], ay1[:, None], ax2[:, None], ay2[:, None],
                    bx2[None, :], by2[None, :])
    o3 = _orient_np(bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
                    ax1[:, None], ay1[:, None])
    o4 = _orient_np(bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
                    ax2[:, None], ay2[:, None])
    return bool(((o1 * o2 < 0) & (o3 * o4 < 0)).any())


def points_in_polygon_np(
    plat: np.ndarray,
    plng: np.ndarray,
    poly_lat: np.ndarray,
    poly_lng: np.ndarray,
    ring_starts=None,
) -> np.ndarray:
    """Vectorized even-odd ray casting: are points inside the polygon?

    Boundary handling: points exactly on a horizontal edge follow the
    even-odd crossing convention (deterministic, matches the numpy oracle
    used by the tests).

    ``ring_starts`` (optional, e.g. ``[0, 4]``) splits the flat vertex
    arrays into rings — outer boundary first, then holes / additional
    shells (OSM multipolygon relations, building footprints with
    courtyards).  Each ring is closed independently and crossings are
    summed across rings, so even-odd parity gives hole semantics: a point
    inside both the outer ring and a hole counts two crossings → outside.
    ``None`` or a single ring is the plain polygon case.
    """
    plat = np.asarray(plat, dtype=np.float64)
    plng = np.asarray(plng, dtype=np.float64)
    vy = np.asarray(poly_lat, dtype=np.float64)
    vx = np.asarray(poly_lng, dtype=np.float64)
    if ring_starts is not None and len(ring_starts) > 1:
        starts = [int(s) for s in ring_starts]
        bounds = starts + [vy.size]
        inside = np.zeros(plat.shape, dtype=bool)
        for a, b in zip(bounds[:-1], bounds[1:]):
            if b > a:
                # XOR of per-ring parities == parity of the summed crossings
                inside ^= points_in_polygon_np(plat, plng, vy[a:b], vx[a:b])
        return inside
    if vy.size and (vy[0] != vy[-1] or vx[0] != vx[-1]):
        vy = np.concatenate((vy, vy[:1]))
        vx = np.concatenate((vx, vx[:1]))
    inside = np.zeros(plat.shape, dtype=bool)
    for i in range(vy.size - 1):
        y1, x1, y2, x2 = vy[i], vx[i], vy[i + 1], vx[i + 1]
        crosses = (y1 > plat) != (y2 > plat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (plat - y1) / (y2 - y1) * (x2 - x1)
        inside ^= crosses & (plng < xint)
    return inside
