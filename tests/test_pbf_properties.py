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


@settings(max_examples=40, deadline=None)
@given(
    st.lists(  # nodes: (id, lat raw 1e-7 deg, lng raw, has_tags)
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=-800_000_000, max_value=800_000_000),
            st.integers(min_value=-1_700_000_000, max_value=1_700_000_000),
            st.booleans(),
        ),
        min_size=0, max_size=30, unique_by=lambda r: r[0],
    ),
    st.lists(  # ways: (id, n_tags 0-3, n_refs 0-6)
        st.tuples(
            st.integers(min_value=1, max_value=2**30),
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=0, max_size=12, unique_by=lambda r: r[0],
    ),
    st.lists(  # relations: (id, n_members 0-4)
        st.tuples(
            st.integers(min_value=1, max_value=2**30),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=0, max_size=6, unique_by=lambda r: r[0],
    ),
)
def test_flat_parser_equals_reference_parser_property(
    tmp_path_factory, nodes, ways, rels
):
    """For ARBITRARY entity mixes (tagged/untagged nodes, empty-ref ways,
    empty-member relations, any block splits) the vectorized flat parser
    reproduces the reference per-message walk exactly."""
    node_ids = np.array(sorted(r[0] for r in nodes), dtype=np.int64)
    by_id = {r[0]: r for r in nodes}
    lats = np.array([by_id[i][1] for i in node_ids], dtype=np.float64) * 1e-7
    lngs = np.array([by_id[i][2] for i in node_ids], dtype=np.float64) * 1e-7
    ntags = [
        {"k": f"v{i}", "n": "x"} if by_id[i][3] else None for i in node_ids
    ]
    ref_pool = node_ids if node_ids.size else np.array([1], dtype=np.int64)
    w_list = [
        (wid, {f"t{j}": str(j) for j in range(ntg)},
         np.sort(ref_pool[np.arange(nrf) % ref_pool.size]))
        for wid, ntg, nrf in ways
    ]
    r_list = [
        (rid, {"type": "restriction"} if nm else {},
         [("way", int(j + 1), "via" if j % 2 else "from") for j in range(nm)])
        for rid, nm in rels
    ]
    path = str(tmp_path_factory.mktemp("prop") / "mix.osm.pbf")
    pbf.write_osm_pbf(
        path,
        nodes=(node_ids, lats, lngs, ntags) if node_ids.size else None,
        ways=w_list or None,
        relations=r_list or None,
        block_size=5,
    )
    with open(path, "rb") as f:
        for off, ln, typ in pbf.pbf_manifest(path):
            if typ != "OSMData":
                continue
            f.seek(off)
            data = pbf._decompress_blob(f.read(ln))
            ref = pbf.parse_primitive_block_ref(data)
            got = pbf._legacy_from_flat(pbf.parse_primitive_block_flat(data))
            assert got["nodes"][0].tolist() == ref["nodes"][0].tolist()
            assert got["nodes"][1].tolist() == ref["nodes"][1].tolist()
            assert got["nodes"][2].tolist() == ref["nodes"][2].tolist()
            assert got["nodes"][3] == ref["nodes"][3]
            assert [(w[0], w[1], w[2].tolist()) for w in got["ways"]] == [
                (w[0], w[1], w[2].tolist()) for w in ref["ways"]
            ]
            assert [
                (r[0], r[1], list(r[2]), r[3].tolist(), r[4].tolist())
                for r in got["relations"]
            ] == [
                (r[0], r[1], list(r[2]), r[3].tolist(), r[4].tolist())
                for r in ref["relations"]
            ]
