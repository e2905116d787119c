"""NGF1 framed-blob source: S1 manifest walk + S2/S3/S4 parallel decode."""

from __future__ import annotations

import numpy as np
import pytest

from navgraph_osm_spark.sources.framed import (
    frame_manifest,
    scan_framed_nodes,
    write_framed_nodes,
)


@pytest.fixture(scope="module")
def node_arrays():
    rng = np.random.default_rng(7)
    n = 25_000
    ids = np.cumsum(rng.integers(1, 50, n)).astype(np.int64)  # sorted, gappy
    # coordinates on the 1e-7-degree grid (OSM PBF granularity)
    lats = rng.integers(-85_0000000, 85_0000000, n).astype(np.float64) / 1e7
    lngs = rng.integers(-180_0000000, 180_0000000, n).astype(np.float64) / 1e7
    return ids, lats, lngs


def test_roundtrip(spark, tmp_path, node_arrays):
    ids, lats, lngs = node_arrays
    path = str(tmp_path / "nodes.ngf1")
    n_frames = write_framed_nodes(path, ids, lats, lngs, block_size=4096)
    assert n_frames == int(np.ceil(ids.size / 4096))
    assert len(frame_manifest(path)) == n_frames

    got = scan_framed_nodes(spark, path).toPandas().sort_values("id").reset_index(drop=True)
    assert len(got) == ids.size
    order = np.argsort(ids)
    np.testing.assert_array_equal(got["id"].to_numpy(), ids[order])
    np.testing.assert_allclose(got["lat"].to_numpy(), lats[order], atol=1e-12)
    np.testing.assert_allclose(got["lng"].to_numpy(), lngs[order], atol=1e-12)


def test_decode_is_partition_parallel(spark, tmp_path, node_arrays):
    """Same result regardless of how the manifest is partitioned."""
    ids, lats, lngs = node_arrays
    path = str(tmp_path / "nodes.ngf1")
    write_framed_nodes(path, ids, lats, lngs, block_size=1000)
    a = scan_framed_nodes(spark, path, partitions=1).toPandas().sort_values("id")
    b = scan_framed_nodes(spark, path, partitions=16).toPandas().sort_values("id")
    np.testing.assert_array_equal(a["id"].to_numpy(), b["id"].to_numpy())
    np.testing.assert_array_equal(a["lat"].to_numpy(), b["lat"].to_numpy())


def test_magic_check(tmp_path):
    p = tmp_path / "bogus.bin"
    p.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError):
        frame_manifest(str(p))


def test_nonuniform_offsets(spark, tmp_path):
    """lat/lon offsets (OSM PBF header fields) are honored in S4."""
    ids = np.array([1, 2, 3], dtype=np.int64)
    lats = np.array([10.0000003, -5.5, 0.0])
    lngs = np.array([100.0000001, -120.25, 0.0])
    path = str(tmp_path / "off.ngf1")
    write_framed_nodes(path, ids, lats, lngs, lat_offset=300, lon_offset=100)
    got = scan_framed_nodes(spark, path).toPandas().sort_values("id")
    np.testing.assert_allclose(got["lat"].to_numpy(), lats, atol=1e-12)
    np.testing.assert_allclose(got["lng"].to_numpy(), lngs, atol=1e-12)
