#!/usr/bin/env python3
"""Capture .explain("formatted") for the headline queries into plans/r06/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default: the
bench headline set).  Plans only — no jobs are executed beyond what query
construction itself triggers (bounded probes, tiny fixture writes).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "sp_pip_join", "sp_tile_assignment", "sp_knn_adaptive",
    "sp_cell_histogram", "gb_edges", "gb_turns", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_clusters", "sim_cosine_topk",
    "q1_pricing_summary", "ev_sessionize", "sp_distance_join",
    "sp_overlay_join",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import navgraph_osm_spark.queries as Q
    from navgraph_osm_spark.session import get_spark

    spark = get_spark("plans", parallelism=cpus)
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    qs = Q.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
    spark.stop()


if __name__ == "__main__":
    main()
