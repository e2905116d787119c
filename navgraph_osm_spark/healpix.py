"""HEALPix RING-scheme pixelization: the reference's actual partition key.

The reference partitions geometry by ``ang2pix_ring`` with N_SIDE = 50
(reference include/healpix/utils.hpp:13, call sites
include/mt/parse/worker.hpp:163-175, main.cpp:305-316).  The Morton grid in
cells.py is the engine's default (hierarchical, SQL-checkable), but it is
not equal-area; this module provides the HEALPix RING index as an alternate
cell backend so the reference's partition counts and occupancy distribution
are reproducible exactly.

The math is the standard public-domain HEALPix construction (Górski et al.
2005): 12·nside² equal-area pixels, polar caps for |z| > 2/3 and an
equatorial band otherwise, pixels numbered ring by ring from the north
pole.  RING supports any nside (the reference's 50 is not a power of two).

Three implementations, guaranteed equal (tested):

- **numpy** (``ang2pix_ring_np``) — vectorized; pandas-UDF building block
  and test oracle.
- **Column expressions** (``ang2pix_ring_expr``) — pure
  ``pyspark.sql.functions``; whole-stage codegen, no Python.
- **SQL string** (``ang2pix_ring_sql``) — the DuckDB twin for driver
  oracles.

To keep all three bit-identical, the azimuth enters as ``tt = (lng mod
360) / 90`` (no π in the hot path — algebraically equal to φ/(π/2) but
immune to libm rounding differences); only ``sin`` (for z) and ``sqrt``
(in the caps) touch libm, and their results feed ``floor`` with spacing
~1e-5, so a last-ulp divergence cannot flip a pixel in practice.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SIDE_REFERENCE = 50  # reference include/healpix/utils.hpp:13


def npix(nside: int) -> int:
    return 12 * nside * nside


def ang2pix_ring_np(lat_deg: np.ndarray, lng_deg: np.ndarray, nside: int) -> np.ndarray:
    """Vectorized lat/lng (degrees) → RING pixel index (numpy)."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lng = np.asarray(lng_deg, dtype=np.float64)
    z = np.sin(np.radians(lat))
    za = np.abs(z)
    tt = np.mod(lng, 360.0) / 90.0

    # equatorial band
    temp1 = nside * (0.5 + tt)
    temp2 = nside * z * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)
    jm = np.floor(temp1 + temp2).astype(np.int64)
    ir = nside + 1 + jp - jm
    kshift = 1 - (ir & 1)
    ip = (jp + jm - nside + kshift + 1) // 2
    ip = np.mod(ip, 4 * nside)
    ncap = 2 * nside * (nside - 1)
    pix_eq = ncap + (ir - 1) * 4 * nside + ip

    # polar caps
    tp = tt - np.floor(tt)
    tmp = nside * np.sqrt(3.0 * (1.0 - za))
    jp_c = np.floor(tp * tmp).astype(np.int64)
    jm_c = np.floor((1.0 - tp) * tmp).astype(np.int64)
    ir_c = jp_c + jm_c + 1
    ip_c = np.floor(tt * ir_c).astype(np.int64)
    ip_c = np.mod(ip_c, 4 * ir_c)
    pix_north = 2 * ir_c * (ir_c - 1) + ip_c
    pix_south = npix(nside) - 2 * ir_c * (ir_c + 1) + ip_c

    return np.where(za <= 2.0 / 3.0, pix_eq, np.where(z > 0, pix_north, pix_south))


def ang2pix_ring_expr(lat: Column, lng: Column, nside: int) -> Column:
    """lat/lng columns → RING pixel, pure column arithmetic (codegen)."""
    z = F.sin(F.radians(lat))
    za = F.abs(z)
    tt = F.pmod(lng, F.lit(360.0)) / F.lit(90.0)

    temp1 = F.lit(float(nside)) * (F.lit(0.5) + tt)
    temp2 = F.lit(float(nside)) * z * F.lit(0.75)
    jp = F.floor(temp1 - temp2).cast("long")
    jm = F.floor(temp1 + temp2).cast("long")
    ir = F.lit(nside + 1) + jp - jm
    kshift = F.lit(1) - F.pmod(ir, F.lit(2))
    ip = F.floor((jp + jm - F.lit(nside) + kshift + F.lit(1)) / F.lit(2)).cast("long")
    ip = F.pmod(ip, F.lit(4 * nside))
    ncap = 2 * nside * (nside - 1)
    pix_eq = F.lit(ncap) + (ir - F.lit(1)) * F.lit(4 * nside) + ip

    tp = tt - F.floor(tt)
    tmp = F.lit(float(nside)) * F.sqrt(F.lit(3.0) * (F.lit(1.0) - za))
    jp_c = F.floor(tp * tmp).cast("long")
    jm_c = F.floor((F.lit(1.0) - tp) * tmp).cast("long")
    ir_c = jp_c + jm_c + F.lit(1)
    ip_c = F.pmod(F.floor(tt * ir_c).cast("long"), F.lit(4) * ir_c)
    pix_north = F.lit(2) * ir_c * (ir_c - F.lit(1)) + ip_c
    pix_south = F.lit(npix(nside)) - F.lit(2) * ir_c * (ir_c + F.lit(1)) + ip_c

    return F.when(za <= F.lit(2.0 / 3.0), pix_eq).otherwise(
        F.when(z > 0, pix_north).otherwise(pix_south)
    ).cast("long")


def ang2pix_ring_sql(lat: str, lng: str, nside: int) -> str:
    """DuckDB/ANSI SQL computing the exact pixel of :func:`ang2pix_ring_expr`.

    Written with the same operation order (tt from degrees, not radians) so
    the doubles match Spark bit-for-bit before each floor.
    """
    z = f"SIN(RADIANS({lat}))"
    za = f"ABS({z})"
    tt = f"(((({lng}) % 360.0) + 360.0) % 360.0) / 90.0"
    jp = f"CAST(FLOOR({nside} * (0.5 + {tt}) - {nside} * {z} * 0.75) AS BIGINT)"
    jm = f"CAST(FLOOR({nside} * (0.5 + {tt}) + {nside} * {z} * 0.75) AS BIGINT)"
    ir = f"({nside} + 1 + {jp} - {jm})"
    kshift = f"(1 - (((({ir}) % 2) + 2) % 2))"
    ip0 = f"CAST(FLOOR(({jp} + {jm} - {nside} + {kshift} + 1) / 2.0) AS BIGINT)"
    ip = f"(((({ip0}) % {4 * nside}) + {4 * nside}) % {4 * nside})"
    pix_eq = f"({2 * nside * (nside - 1)} + ({ir} - 1) * {4 * nside} + {ip})"

    tp = f"({tt} - FLOOR({tt}))"
    tmp = f"({nside} * SQRT(3.0 * (1.0 - {za})))"
    jp_c = f"CAST(FLOOR({tp} * {tmp}) AS BIGINT)"
    jm_c = f"CAST(FLOOR((1.0 - {tp}) * {tmp}) AS BIGINT)"
    ir_c = f"({jp_c} + {jm_c} + 1)"
    ip_c0 = f"CAST(FLOOR({tt} * {ir_c}) AS BIGINT)"
    ip_c = f"(((({ip_c0}) % (4 * {ir_c})) + 4 * {ir_c}) % (4 * {ir_c}))"
    pix_n = f"(2 * {ir_c} * ({ir_c} - 1) + {ip_c})"
    pix_s = f"({npix(nside)} - 2 * {ir_c} * ({ir_c} + 1) + {ip_c})"

    return (
        f"(CASE WHEN {za} <= 2.0/3.0 THEN {pix_eq} "
        f"WHEN {z} > 0 THEN {pix_n} ELSE {pix_s} END)"
    )


def assign_healpix(
    df: DataFrame, nside: int = N_SIDE_REFERENCE,
    lat: str = "lat", lng: str = "lng", out: str = "pix",
) -> DataFrame:
    """Point rows → + HEALPix RING pixel column — the equal-area alternate
    to spatial_join.assign_cells (reference partitioning, worker.hpp:163-175)."""
    return df.withColumn(out, ang2pix_ring_expr(F.col(lat), F.col(lng), nside))
