#!/usr/bin/env python3
"""Extra benchmarks for the optimization rounds (bench.py itself is frozen).

Modes:
  --noop [query ...]    time each query via the noop sink (guide §1.4) —
                        every column of every row is computed and discarded,
                        so the number is the computation, not count()'s
                        column-pruned fast path.  min-of-N per query.
  --calib               the load-aware host calibration: a fixed 32-task
                        memory-touching shuffle/sort microbench (VERDICT r5
                        item 1) — run it before/after a sweep to bound host
                        drift.

Prints one JSON line, same spirit as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "sp_pip_join", "sp_tile_assignment", "sp_knn_adaptive",
    "sp_cell_histogram", "gb_edges", "gb_turns", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_clusters", "sim_cosine_topk",
    "q1_pricing_summary", "ev_sessionize", "sp_distance_join",
    "sp_overlay_join",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def load_calibrate(spark) -> float:
    """Memory-touching multi-task control: 32 tasks each sorting/shuffling
    a seeded 2M-row range with a wide payload — sensitive to memory
    bandwidth and CPU steal, unlike bench.py's tiny data-free calib."""
    times = []
    for _ in range(2):
        t0 = time.time()
        (
            spark.range(0, 64_000_000, 1, 32)
            .selectExpr(
                "pmod(xxhash64(id), 65536) AS k",
                # bounded values: ANSI mode (Spark 4 default) hard-fails a
                # long-overflowing SUM of raw xxhash64 outputs
                "pmod(xxhash64(id, 1), 1000000007) AS v1",
                "xxhash64(id, 2) AS v2",
                "cast(xxhash64(id, 3) as double) AS v3",
            )
            .groupBy("k")
            .agg({"v1": "sum", "v2": "max", "v3": "avg"})
            .write.format("noop").mode("overwrite").save()
        )
        times.append(time.time() - t0)
    return round(min(times), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--noop", nargs="*", default=None)
    ap.add_argument("--calib", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    args = ap.parse_args()

    import navgraph_osm_spark.queries as Q
    from navgraph_osm_spark.session import get_spark

    import bench as B

    spark = get_spark("bench_extra", parallelism=args.cpus)
    B._warmup(spark, args.cpus)
    out: dict = {"metric": "bench_extra", "sf": args.sf_dir, "cpus": args.cpus}
    if args.calib:
        out["load_calib_s"] = load_calibrate(spark)
    if args.noop is not None:
        names = args.noop or HEADLINE
        qs = Q.queries()
        # codegen warm at the tiny SF, as bench.py does
        warm_dir = "/root/testdata/sf0.001"
        for name in names:
            qs[name](spark, warm_dir).count()
        timings: dict[str, float] = {}
        raw: dict[str, list[float]] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"noop:{name}")
            raw[name] = []
            for _ in range(args.repeats):
                t0 = time.time()
                _noop(qs[name](spark, args.sf_dir))
                raw[name].append(round(time.time() - t0, 3))
            timings[name] = min(raw[name])
            spark.sparkContext.setJobDescription(None)
        out["queries_noop"] = timings
        out["queries_noop_raw"] = raw
        out["total_noop"] = round(sum(timings.values()), 3)
    if args.calib:
        out["load_calib_after_s"] = load_calibrate(spark)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
