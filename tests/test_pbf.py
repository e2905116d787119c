"""OSM PBF source tests: wire-format primitives, an independently
hand-crafted byte-literal block (reader vs the PUBLIC spec, not vs our own
writer), writer↔reader round trips, Spark scans, and the full
PBF → graph-build pipeline with hand-computed reference counters
(reference main.cpp:204-222 Filestat)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from navgraph_osm_spark.sources import pbf


def test_packed_varint_roundtrip_extremes():
    rng = np.random.default_rng(7)
    v = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, 500, dtype=np.int64),
            np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64),
        ]
    )
    enc = pbf.encode_packed_uvarints(pbf._zigzag(v))
    dec = pbf._unzigzag(pbf.decode_packed_uvarints(np.frombuffer(enc, np.uint8)))
    assert (dec == v).all()


def test_reader_decodes_handcrafted_spec_bytes(tmp_path):
    """A PrimitiveBlock built from raw hex per the PUBLIC osmformat.proto
    field numbers — ids [5,7], raw lats [4,-2], raw lons [3,3] at default
    granularity 100 — validates the reader with no writer involvement."""
    dense = bytes(
        [0x0A, 0x02, 0x0A, 0x04]  # id (f1, packed): zigzag deltas 5,2
        + [0x42, 0x02, 0x08, 0x0B]  # lat (f8): zigzag deltas 4,-6
        + [0x4A, 0x02, 0x06, 0x00]  # lon (f9): zigzag deltas 3,0
    )
    group = bytes([0x12, len(dense)]) + dense  # PrimitiveGroup.dense (f2)
    strtab = bytes([0x0A, 0x00])  # StringTable with one empty entry
    block = bytes([0x0A, len(strtab)]) + strtab + bytes([0x12, len(group)]) + group
    blob = bytes([0x0A, len(block)]) + block  # Blob.raw (f1)
    blob += bytes([0x10, len(block)])  # Blob.raw_size (f2)
    header = bytes([0x0A, 0x07]) + b"OSMData" + bytes([0x18, len(blob)])
    p = tmp_path / "hand.osm.pbf"
    p.write_bytes(struct.pack(">I", len(header)) + header + blob)

    man = pbf.pbf_manifest(str(p))
    assert man == [(4 + len(header), len(blob), "OSMData")]
    with open(p, "rb") as f:
        f.seek(man[0][0])
        blk = pbf.parse_primitive_block(pbf._decompress_blob(f.read(man[0][1])))
    ids, lats, lngs, tags = blk["nodes"]
    assert ids.tolist() == [5, 7]
    # convertCoord: (0 + 100 * raw) / 1e9
    assert lats.tolist() == pytest.approx([4e-7, -2e-7])
    assert lngs.tolist() == pytest.approx([3e-7, 3e-7])


@pytest.fixture(scope="module")
def tiny_pbf(tmp_path_factory):
    """4 nodes, 2 ways (one non-highway), 1 restriction relation; written
    across multiple small blobs to exercise block splitting."""
    path = str(tmp_path_factory.mktemp("pbf") / "tiny.osm.pbf")
    ids = np.array([10, 11, 12, 50], dtype=np.int64)
    lats = np.array([1.0001, 1.0002, 1.0003, -5.5])
    lngs = np.array([2.0001, 2.0002, 2.0003, 170.25])
    ntags = [None, {"amenity": "cafe"}, None, {"name": "x", "ele": "12"}]
    ways = [
        (100, {"highway": "residential", "oneway": "yes"}, np.array([10, 11, 12])),
        (101, {"waterway": "river"}, np.array([12, 50])),
    ]
    rels = [
        (
            7,
            {"type": "restriction", "restriction": "no_left_turn"},
            [("way", 100, "from"), ("node", 12, "via"), ("way", 101, "to")],
        )
    ]
    pbf.write_osm_pbf(
        path, nodes=(ids, lats, lngs, ntags), ways=ways, relations=rels, block_size=3
    )
    return path


def test_roundtrip_all_entities(spark, tiny_pbf):
    t = pbf.load_osm_tables(spark, tiny_pbf)
    nodes = {r["id"]: (r["lat"], r["lng"]) for r in t["nodes"].collect()}
    assert set(nodes) == {10, 11, 12, 50}
    assert nodes[10] == pytest.approx((1.0001, 2.0001))
    assert nodes[50] == pytest.approx((-5.5, 170.25))

    ways = {r["id"]: r["tags"] for r in t["ways"].collect()}
    assert ways[100] == {"highway": "residential", "oneway": "yes"}
    assert ways[101] == {"waterway": "river"}

    wn = sorted(
        (r["way_id"], r["seq"], r["node_id"]) for r in t["way_nodes"].collect()
    )
    assert wn == [(100, 1, 10), (100, 2, 11), (100, 3, 12), (101, 1, 12), (101, 2, 50)]

    mem = sorted(
        (r["rel_id"], r["seq"], r["member_type"], r["role"], r["member_id"])
        for r in t["relation_members"].collect()
    )
    assert mem == [
        (7, 0, "way", "from", 100),
        (7, 1, "node", "via", 12),
        (7, 2, "way", "to", 101),
    ]
    rtags = {r["rel_id"]: r["tags"] for r in t["relation_tags"].collect()}
    assert rtags[7]["restriction"] == "no_left_turn"

    ntags = {r["id"]: r["tags"] for r in pbf.scan_pbf(spark, tiny_pbf, "node_tags").collect()}
    assert ntags == {11: {"amenity": "cafe"}, 50: {"name": "x", "ele": "12"}}


def test_granularity_and_offsets(spark, tmp_path):
    """Non-default granularity + lat/lon offsets follow convertCoord
    (reference primitive-block-parser.cpp:4-7) exactly."""
    path = str(tmp_path / "g.osm.pbf")
    ids = np.array([1, 2], dtype=np.int64)
    lats = np.array([10.000001, 10.000002])
    lngs = np.array([20.000001, 20.000002])
    pbf.write_osm_pbf(
        path, nodes=(ids, lats, lngs), granularity=1000,
        lat_offset=10_000_000_000, lon_offset=20_000_000_000,
    )
    got = {r["id"]: (r["lat"], r["lng"]) for r in
           pbf.scan_pbf(spark, path, "nodes").collect()}
    assert got[1] == pytest.approx((10.000001, 20.000001), abs=1e-12)
    assert got[2] == pytest.approx((10.000002, 20.000002), abs=1e-12)


def _grid_graph(tmp_path, n_ways=6, nodes_per_way=5):
    """Deterministic multi-way graph: way w uses nodes [w*10 .. w*10+4] plus
    a SHARED node 999 at position 2 — so every way is split exactly there.
    Odd ways are oneway, way 0 is not a highway."""
    node_ids, lats, lngs = [999], [0.0005], [0.0005]
    ways = []
    for w in range(n_ways):
        refs = []
        for i in range(nodes_per_way):
            if i == 2:
                refs.append(999)
                continue
            nid = w * 10 + i + 1000
            node_ids.append(nid)
            lats.append(round(0.001 * (w + 1), 7))
            lngs.append(round(0.001 * (i + 1), 7))
            refs.append(nid)
        tags = {"highway": "residential"} if w else {"building": "yes"}
        if w % 2 == 1:
            tags["oneway"] = "yes"
        ways.append((w + 1, tags, np.array(refs, dtype=np.int64)))
    path = str(tmp_path / "grid.osm.pbf")
    pbf.write_osm_pbf(
        path,
        nodes=(np.array(node_ids, np.int64), np.array(lats), np.array(lngs)),
        ways=ways,
        block_size=4,
    )
    return path


def test_pbf_pipeline_counters(spark, tmp_path):
    """End-to-end: .osm.pbf → graph build; counters match hand computation
    (the reference's Filestat print, main.cpp:204-222).

    5 highway ways × 5 nodes, all sharing node 999 (used=5×1+0 endpoints →
    interior on each) → each way splits into 2 segments: ways_used=5,
    edges_fwd=10, nodes_kept = 5×4 distinct + shared = 21."""
    from navgraph_osm_spark.operators import graph_build

    path = _grid_graph(tmp_path)
    t = pbf.load_osm_tables(spark, path)
    edges = graph_build.build_edges(t["nodes"], t["ways"], t["way_nodes"], res=6)
    fwd = edges.filter("direction = 0")
    assert fwd.count() == 10
    assert fwd.select("way_id").distinct().count() == 5
    kept = graph_build.node_usage(
        graph_build._kept_way_nodes(t["ways"], t["way_nodes"])
    )
    assert kept.count() == 21
    # two-way highways are w=2,4 → way ids 3,5 (w%2==1 → oneway tag)
    rev_ways = {
        r["way_id"] for r in edges.filter("direction = 1").select("way_id").collect()
    }
    assert rev_ways == {3, 5}

    # identical edges when the same tables enter the pipeline as plain
    # DataFrames (PBF decode is transparent to graph build)
    direct = graph_build.build_edges(
        spark.createDataFrame(
            [(int(r["id"]), float(r["lat"]), float(r["lng"]))
             for r in t["nodes"].collect()],
            "id long, lat double, lng double",
        ),
        spark.createDataFrame(
            [(int(r["id"]), r["tags"]) for r in t["ways"].collect()],
            "id long, tags map<string,string>",
        ),
        spark.createDataFrame(
            [(int(r["way_id"]), int(r["seq"]), int(r["node_id"]))
             for r in t["way_nodes"].collect()],
            "way_id long, seq int, node_id long",
        ),
        res=6,
    )
    a = sorted(map(tuple, edges.select("edge_id", "src_node", "tgt_node").collect()))
    b = sorted(map(tuple, direct.select("edge_id", "src_node", "tgt_node").collect()))
    assert a == b


def test_pbf_restrictions_pivot(spark, tiny_pbf):
    """relation_members + relation_tags feed pivot_restrictions directly."""
    from navgraph_osm_spark.operators.relations import pivot_restrictions

    t = pbf.load_osm_tables(spark, tiny_pbf)
    got = pivot_restrictions(t["relation_members"], t["relation_tags"]).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["from_way"], r["via_node"], r["to_way"]) == (100, 12, 101)
