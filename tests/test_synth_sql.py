"""SQL twins of the synthetic generator's RNG: splitmix64 / _u01 / geo."""

from __future__ import annotations

import duckdb
import numpy as np

from navgraph_osm_spark.sources.synth import (
    _u01,
    image_fields,
    image_geo_sql_cte,
    u01_sql_stages,
)


def _run_stages(con, stages, n):
    sql = f"WITH c0 AS (SELECT i FROM range(0, {n}) t(i))"
    prev = "c0"
    for k, (col, expr) in enumerate(stages):
        sql += f", c{k + 1} AS (SELECT *, {expr} AS {col} FROM {prev})"
        prev = f"c{k + 1}"
    last = stages[-1][0]
    return con.execute(f"{sql} SELECT {last} FROM {prev} ORDER BY i").df()[last]


def test_u01_sql_bit_exact():
    """DuckDB reproduces _u01 bit-for-bit for every stream used by the
    image generator (splitmix64 via HUGEINT 32-bit-halves mulmod)."""
    con = duckdb.connect()
    ids = np.arange(3000, dtype=np.int64)
    for stream in (1, 2, 3, 4, 5, 11):
        got = _run_stages(con, u01_sql_stages("i", 42, stream, "x"), 3000).to_numpy()
        assert (got == _u01(ids, 42, stream)).all(), stream


def test_image_geo_sql_matches_numpy():
    """The full lat/lng derivation (cluster pick + Box–Muller + uniform
    remainder): integer path bit-exact; the libm trig may differ in the
    last ulp on rare rows — bounded at 1e-12 degrees absolute."""
    con = duckdb.connect()
    n = 2000
    df = con.execute(
        "WITH " + image_geo_sql_cte(n) + " SELECT * FROM geo ORDER BY i"
    ).df()
    want = image_fields(np.arange(n, dtype=np.int64))
    lat_exact = (df["lat"].to_numpy() == want["lat"].to_numpy()).mean()
    lng_exact = (df["lng"].to_numpy() == want["lng"].to_numpy()).mean()
    assert lat_exact > 0.99 and lng_exact > 0.99
    assert np.allclose(df["lat"], want["lat"], rtol=0, atol=1e-12)
    assert np.allclose(df["lng"], want["lng"], rtol=0, atol=1e-12)
