"""End-to-end pipeline: stage outputs, lineage, resume, export parity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from navgraph_osm_spark.operators.graph_build import build_edges
from navgraph_osm_spark.operators.turn_expand import expand_turns
from navgraph_osm_spark.pipeline import run_full_pipeline
from navgraph_osm_spark.sources.synth import gen_road_grid


@pytest.fixture(scope="module")
def grid(spark):
    return gen_road_grid(spark, rows=4, cols=4, seed=42)


def test_pipeline_end_to_end_and_resume(spark, grid, tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    out = run_full_pipeline(spark, wh, grid, res=12)

    # stage outputs match direct operator composition
    edges_direct = build_edges(grid["nodes"], grid["ways"], grid["way_nodes"], res=12)
    turns_direct = expand_turns(edges_direct, grid["restrictions"])
    assert out["edges"].count() == edges_direct.count()
    assert out["turns"].count() == turns_direct.count()
    assert out["export"].count() == turns_direct.count()
    got_pairs = {
        (r["src_edge_id"], r["tgt_edge_id"]) for r in out["turns"].collect()
    }
    want_pairs = {
        (r["src_edge_id"], r["tgt_edge_id"]) for r in turns_direct.collect()
    }
    assert got_pairs == want_pairs

    counts = out["counts"].first()
    assert counts["nodes_kept"] == 16  # every grid node used by 2 ways
    assert counts["ways_used"] == 8

    # lineage sidecars: per-partition rows for the partitioned stage
    with open(os.path.join(wh, "edges._lineage.json")) as f:
        lin = json.load(f)
    assert lin["rows"] == out["edges"].count()
    assert lin["partition_by"] == ["part_cell"] and len(lin["partitions"]) >= 1

    n_turns = out["turns"].count()

    # resume: tables already valid → stages skipped (same row counts, fast)
    out2 = run_full_pipeline(spark, wh, grid, res=12, resume=True)
    assert out2["turns"].count() == n_turns

    # corrupt one lineage file → only that stage recomputes
    with open(os.path.join(wh, "turns._lineage.json"), "w") as f:
        json.dump({"rows": -1}, f)
    out3 = run_full_pipeline(spark, wh, grid, res=12, resume=True)
    assert out3["turns"].count() == n_turns
