"""CLI entry point (python -m navgraph_osm_spark) — the reference-binary shape."""

from __future__ import annotations

import os

from navgraph_osm_spark.__main__ import main


def test_cli_demo_grid(spark, tmp_path):
    out_csv = str(tmp_path / "graph_csv")
    counts = main(
        [
            "--demo-grid", "5x5",
            "--warehouse", str(tmp_path / "wh"),
            "ignored_placeholder",  # input_dir unused with --demo-grid
            out_csv,
        ],
        spark=spark,
    )
    assert counts["expanded_edges"] > 0
    assert counts["edges_emitted"] > 0
    files = [f for f in os.listdir(out_csv) if f.endswith(".csv")]
    assert files
    header = open(os.path.join(out_csv, files[0])).readline()
    assert header.startswith("weight,geom,was_one_way,osm_way_from")


def test_cli_input_dir_with_raw_relations(spark, tmp_path):
    """Input dir carrying RAW relation tables: the CLI pivots via F3."""
    from navgraph_osm_spark.sources.synth import gen_road_grid

    tables = gen_road_grid(spark, rows=4, cols=4)
    d = str(tmp_path / "in")
    os.makedirs(d, exist_ok=True)
    for name in ("nodes", "ways", "way_nodes", "relation_members", "relation_tags"):
        tables[name].write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))
    counts = main([d, "--warehouse", str(tmp_path / "wh2"), "--res", "10"], spark=spark)
    assert counts["expanded_edges"] > 0
    # resume run: same answer, stages skipped (no error, identical counts)
    counts2 = main([d, "--warehouse", str(tmp_path / "wh2"), "--res", "10"], spark=spark)
    assert counts2["expanded_edges"] == counts["expanded_edges"]
