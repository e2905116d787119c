"""Property-based and forward-compatibility tests for the PBF wire codec."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from navgraph_osm_spark.sources import pbf


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=60
    )
)
def test_varint_zigzag_roundtrip(values):
    v = np.array(values, dtype=np.int64)
    enc = pbf.encode_packed_uvarints(pbf._zigzag(v))
    dec = pbf._unzigzag(pbf.decode_packed_uvarints(np.frombuffer(enc, np.uint8)))
    assert dec.tolist() == values


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),  # node id
            st.integers(min_value=-900_000_000, max_value=900_000_000),  # lat 1e-7°
            st.integers(min_value=-1_800_000_000, max_value=1_800_000_000),  # lng
        ),
        min_size=1,
        max_size=50,
    )
)
def test_dense_nodes_block_roundtrip(tmp_path_factory, rows):
    """Arbitrary ids (any order, negatives) and coordinates on the 1e-7°
    grid survive the DenseNodes delta+zigzag+fixed-point roundtrip exactly."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    lats = np.array([r[1] for r in rows], dtype=np.float64) * 1e-7
    lngs = np.array([r[2] for r in rows], dtype=np.float64) * 1e-7
    path = str(tmp_path_factory.mktemp("prop") / "p.osm.pbf")
    pbf.write_osm_pbf(path, nodes=(ids, lats, lngs), block_size=7)
    got_ids, got_lats, got_lngs = [], [], []
    with open(path, "rb") as f:
        for off, ln, typ in pbf.pbf_manifest(path):
            if typ != "OSMData":
                continue
            f.seek(off)
            blk = pbf.parse_primitive_block(pbf._decompress_blob(f.read(ln)))
            got_ids.append(blk["nodes"][0])
            got_lats.append(blk["nodes"][1])
            got_lngs.append(blk["nodes"][2])
    got_ids = np.concatenate(got_ids)
    assert got_ids.tolist() == ids.tolist()
    # decode is (granularity * raw)/1e9 — exact on the 1e-7° grid up to one
    # float64 rounding of the original degree value
    assert np.allclose(np.concatenate(got_lats), lats, rtol=0, atol=1e-12)
    assert np.allclose(np.concatenate(got_lngs), lngs, rtol=0, atol=1e-12)


def _field_bytes(fnum: int, wt: int, payload: bytes) -> bytes:
    tag = pbf.encode_packed_uvarints(np.array([(fnum << 3) | wt], dtype=np.uint64))
    if wt == 2:
        return tag + pbf.encode_packed_uvarints(
            np.array([len(payload)], dtype=np.uint64)
        ) + payload
    return tag + payload


def test_reader_skips_unknown_fields():
    """Real planet extracts carry fields this engine does not consume
    (DenseInfo, Way.info, HeaderBlock bbox, future extensions).  The wire
    walker must skip ANY unknown field by wire type without disturbing the
    decoded entities."""
    # DenseNodes with ids [5], lat [4], lon [3] ... plus a fake denseinfo
    # (field 5, length-delimited), an unknown varint field 19, and an
    # unknown fixed64 field 20
    dense = (
        _field_bytes(1, 2, bytes([0x0A]))  # id: zigzag(5)=10
        + _field_bytes(5, 2, b"\x08\x01\x10\x02")  # denseinfo-ish message
        + _field_bytes(8, 2, bytes([0x08]))  # lat: zigzag(4)=8
        + _field_bytes(9, 2, bytes([0x06]))  # lon: zigzag(3)=6
        + _field_bytes(19, 0, bytes([0x2A]))  # unknown varint
        + _field_bytes(20, 1, b"\x00" * 8)  # unknown fixed64
    )
    group = _field_bytes(2, 2, dense)
    strtab = _field_bytes(1, 2, b"")
    block = _field_bytes(1, 2, strtab) + _field_bytes(2, 2, group)
    # unknown top-level fixed32 field too
    block += _field_bytes(21, 5, b"\x00" * 4)
    blk = pbf.parse_primitive_block(block)
    ids, lats, lngs, _tags = blk["nodes"]
    assert ids.tolist() == [5]
    assert lats.tolist() == pytest.approx([4e-7])
    assert lngs.tolist() == pytest.approx([3e-7])


def test_way_with_info_field_and_unpacked_refs():
    """Ways carrying an info submessage (field 4) and NON-packed repeated
    refs (wire type 0 per element — legal protobuf) decode identically."""
    way = (
        _field_bytes(1, 0, bytes([0x64]))  # id = 100
        + _field_bytes(4, 2, b"\x08\x05")  # info message (skipped)
        + _field_bytes(8, 0, bytes([0x14]))  # ref delta zigzag(10)=20, unpacked
        + _field_bytes(8, 0, bytes([0x02]))  # ref delta zigzag(1)=2, unpacked
    )
    group = _field_bytes(3, 2, way)
    strtab = _field_bytes(1, 2, b"")
    block = _field_bytes(1, 2, strtab) + _field_bytes(2, 2, group)
    blk = pbf.parse_primitive_block(block)
    assert len(blk["ways"]) == 1
    wid, tags, refs = blk["ways"][0]
    assert wid == 100 and tags == {}
    assert refs.tolist() == [10, 11]
