"""CSV export: reference row shape + geometry midpoint semantics."""

from __future__ import annotations

import re

import pytest

from navgraph_osm_spark.functions.geo import find_middle_point_np
from navgraph_osm_spark.operators.export import export_rows, write_csv
from navgraph_osm_spark.operators.graph_build import build_edges
from navgraph_osm_spark.operators.turn_expand import expand_turns
from navgraph_osm_spark.sources.synth import gen_road_grid

_LS = re.compile(r"^LINESTRING\((-?\d+\.\d{6} -?\d+\.\d{6})(;-?\d+\.\d{6} -?\d+\.\d{6})*\)$")


@pytest.fixture(scope="module")
def graph(spark):
    grid = gen_road_grid(spark, rows=3, cols=3, seed=42)
    edges = build_edges(grid["nodes"], grid["ways"], grid["way_nodes"], res=12)
    edges.cache()
    turns = expand_turns(edges, grid["restrictions"])
    return edges, turns


def test_export_shape_and_counts(graph):
    edges, turns = graph
    out = export_rows(edges, turns)
    assert out.columns == [
        "weight", "geom", "was_one_way", "osm_way_from", "osm_way_to",
        "from_source_node", "from_target_node", "to_source_node", "to_target_node",
        "src_mid_lat", "src_mid_lng", "tgt_mid_lat", "tgt_mid_lng",
    ]
    rows = out.collect()
    assert len(rows) == turns.count()
    for r in rows:
        assert _LS.match(r["geom"]), r["geom"]
        assert r["was_one_way"] in (0, 1)
        assert r["weight"] > 0


def test_geom_starts_at_source_midpoint(graph):
    edges, turns = graph
    t = turns.first()
    e = edges.filter(edges["edge_id"] == t["src_edge_id"]).first()
    lats = [p["lat"] for p in e["geom"]]
    lngs = [p["lng"] for p in e["geom"]]
    mlat, mlng = find_middle_point_np(lats, lngs)
    row = (
        export_rows(edges, turns.limit(0).unionByName(turns.filter(
            (turns["src_edge_id"] == t["src_edge_id"]) & (turns["tgt_edge_id"] == t["tgt_edge_id"])
        )))
    ).first()
    first_pt = row["geom"][len("LINESTRING(") :].split(";")[0]
    lng_s, lat_s = first_pt.split(" ")
    assert abs(float(lng_s) - mlng) < 5e-7 and abs(float(lat_s) - mlat) < 5e-7


def test_write_csv(tmp_path, graph):
    edges, turns = graph
    write_csv(edges, turns, str(tmp_path / "out"))
    import glob

    files = glob.glob(str(tmp_path / "out" / "*.csv"))
    assert files
