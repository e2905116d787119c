"""Graph build: OSM-like tables → per-cell routable edge DataFrame.

Re-expresses the reference's EP2 macro-phase (reference main.cpp:224-755) as
a declarative Spark plan:

- F1/F2 highway + oneway predicates (reference worker.hpp:92-122)
- A1 endpoint-weighted node usage counts (reference main.cpp:270-283,
  endpoint weight 2 via negated ids at worker.hpp:142-144)
- J1 nodes ⋈ usage (reference main.cpp:298-327) — inner join doubles as the
  "drop unused nodes" filter
- W1 way segmentation at nodes with ``used > 1`` (reference main.cpp:557-717)
- W2 haversine leg costs with the reference's Earth radius
  (reference utils/geomath.cpp:7-21, geomath.hpp:6)
- §2.6 union: reverse edges for two-way streets (reference main.cpp:609-617)
- geo-cell assignment on the source node (reference main.cpp:587-620);
  border edges flagged when endpoints fall in different cells (the
  reference's dual-pixel duplication, main.cpp:621-708, is deferred to the
  turn-expansion join which keys by the via node's cell — zero duplication).

Scale notes: one shuffle for the usage agg (map-side partial), one for the
node join, one window shuffle keyed by way_id, one groupBy (way_id, seg).
Edge ids are content-derived (way_id/seg/direction packed) — no global
row_number, so no single-partition bottleneck at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from navgraph_osm_spark.cells import cell_expr
from navgraph_osm_spark.functions.geo import haversine_expr
from navgraph_osm_spark.sources.synth import HIGHWAY_ALLOWED

MAX_SEGMENTS_PER_WAY = 1 << 19  # edge-id packing bound (OSM max nodes/way = 2000)


def filter_ways(ways: DataFrame) -> DataFrame:
    """F1 highway allowlist + F2 oneway predicate → (way_id, oneway:boolean).

    Accepts either flat ``highway``/``oneway`` columns or an OSM-shaped
    ``tags`` map column (the reference reads the string-table tag map,
    worker.hpp:94-121) — the map path dispatches to :func:`filter_ways_tags`.
    """
    if "tags" in ways.columns:
        return filter_ways_tags(ways)
    return ways.filter(F.col("highway").isin(HIGHWAY_ALLOWED)).select(
        F.col("id").alias("way_id"),
        F.coalesce(F.col("oneway").isin("yes", "1"), F.lit(False)).alias("oneway"),
    )


def filter_ways_tags(ways: DataFrame, tags: str = "tags") -> DataFrame:
    """F1/F2 over a ``tags: map<string,string>`` column (reference
    worker.hpp:94-106 highway allowlist, :110-122 oneway ∈ {yes, 1})."""
    hw = F.try_element_at(F.col(tags), F.lit("highway"))
    ow = F.try_element_at(F.col(tags), F.lit("oneway"))
    return ways.filter(hw.isin(HIGHWAY_ALLOWED)).select(
        F.col("id").alias("way_id"),
        # a missing oneway tag means two-way (reference worker.hpp:110-122
        # defaults isOneWay to false)
        F.coalesce(ow.isin("yes", "1"), F.lit(False)).alias("oneway"),
    )


def node_usage(way_nodes_kept: DataFrame) -> DataFrame:
    """A1: per node, sum(endpoint ? 2 : 1) over occurrences in kept ways."""
    return way_nodes_kept.groupBy("node_id").agg(
        F.sum(F.when(F.col("is_endpoint"), 2).otherwise(1)).alias("used")
    )


def _kept_way_nodes(ways: DataFrame, way_nodes: DataFrame) -> DataFrame:
    kept = filter_ways(ways)
    wn = way_nodes.join(kept, "way_id")
    w_span = Window.partitionBy("way_id")
    return (
        wn.withColumn("min_seq", F.min("seq").over(w_span))
        .withColumn("max_seq", F.max("seq").over(w_span))
        .withColumn(
            "is_endpoint",
            (F.col("seq") == F.col("min_seq")) | (F.col("seq") == F.col("max_seq")),
        )
    )


def build_edges(
    nodes: DataFrame, ways: DataFrame, way_nodes: DataFrame, res: int = 12
) -> DataFrame:
    """Full EP2 pipeline → edges DataFrame.

    Output columns: edge_id, way_id, seg, direction (0 fwd / 1 rev),
    oneway, src_node, src_lat, src_lng, tgt_node, tgt_lat, tgt_lng,
    cost (km), geom array<struct<lat,lng>>, src_cell, tgt_cell, is_border.
    """
    wn = _kept_way_nodes(ways, way_nodes)
    # A1 + J1 in ONE pass: per-node usage attached via a window over
    # node_id instead of a groupBy + join-back — the join-back re-planned
    # the whole way-node pipeline a second time (the DataFrame fans out,
    # Spark shares no subtrees), which doubled every upstream scan and
    # shuffle.  The node join is keyed the same way, so it reuses the
    # window's node_id partitioning.
    w_node = Window.partitionBy("node_id")
    occ = wn.select(
        "way_id", "seq", "node_id", "oneway", "min_seq", "max_seq",
        F.sum(F.when(F.col("is_endpoint"), 2).otherwise(1))
        .over(w_node)
        .alias("used"),
    ).join(
        # deliberate SHUFFLE_HASH (guide §3): the node dim is modest per
        # partition and pre-sorted output is not needed — the sort-merge
        # default pays two sorts of the full occurrence relation
        nodes.select(F.col("id").alias("node_id"), "lat", "lng").hint(
            "shuffle_hash"
        ),
        "node_id",
    )

    # W1 segmentation: cut_before = #split-nodes strictly before this seq.
    # The leg cost is computed in the SAME way-keyed window pass (lag over
    # seq) rather than per (way_id, seg) after the explode: within a
    # segment rows are seq-contiguous, so the way-level lag equals the
    # segment-level lag everywhere except the segment-opening duplicate of
    # a split row, which is zeroed explicitly below — one window sort less.
    w_seq = Window.partitionBy("way_id").orderBy("seq")
    split = F.col("used") > 1
    occ = occ.withColumn(
        "cut_before",
        F.coalesce(
            F.sum(split.cast("int")).over(
                w_seq.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("prev_lat", F.lag("lat").over(w_seq)).withColumn(
        "prev_lng", F.lag("lng").over(w_seq)
    )
    # membership: split rows close segment (cut_before-1) and open (cut_before);
    # non-split rows belong to (cut_before-1) only.
    seg_array = F.when(
        split,
        F.filter(
            F.array(
                F.when(F.col("seq") > F.col("min_seq"), F.col("cut_before") - 1),
                F.when(F.col("seq") < F.col("max_seq"), F.col("cut_before")),
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array(F.col("cut_before") - 1))
    occ = occ.withColumn("seg", F.explode(seg_array))

    leg = F.when(
        F.col("prev_lat").isNull()
        # a split row opening segment `cut_before` is that segment's first
        # row — its way-level lag belongs to the previous segment
        | (split & (F.col("seg") == F.col("cut_before"))),
        F.lit(0.0),
    ).otherwise(
        haversine_expr(F.col("prev_lat"), F.col("prev_lng"), F.col("lat"), F.col("lng"))
    )
    # W2 + A6: one groupBy per (way, segment); geometry inline, cost from
    # legs.  hash(way_id) satisfies the (way_id, seg) clustering, so the
    # aggregate runs exchange-free on the window's partitioning, and rows
    # arrive seq-sorted — the float summation order of the previous
    # per-segment window formulation is preserved exactly.
    segs = (
        occ.withColumn("leg_cost", leg)
        .groupBy("way_id", "seg")
        .agg(
            F.first("oneway").alias("oneway"),
            F.sum("leg_cost").alias("cost"),
            F.count("*").alias("n_points"),
            F.min_by("node_id", "seq").alias("src_node"),
            F.min_by("lat", "seq").alias("src_lat"),
            F.min_by("lng", "seq").alias("src_lng"),
            F.max_by("node_id", "seq").alias("tgt_node"),
            F.max_by("lat", "seq").alias("tgt_lat"),
            F.max_by("lng", "seq").alias("tgt_lng"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "lat", "lng"))),
                lambda s: F.struct(s["lat"].alias("lat"), s["lng"].alias("lng")),
            ).alias("geom"),
        )
    )

    # §2.6 reverse edges via a 1-or-2-element explode instead of a union of
    # two branches — a union re-plans the whole upstream pipeline per
    # branch (same fan-out problem as the usage join-back)
    rev = F.col("direction") == 1
    edges = segs.withColumn(
        "direction",
        F.explode(
            F.when(F.col("oneway"), F.array(F.lit(0))).otherwise(
                F.array(F.lit(0), F.lit(1))
            )
        ),
    ).select(
        "way_id",
        "seg",
        "oneway",
        "cost",
        "n_points",
        F.when(rev, F.col("tgt_node")).otherwise(F.col("src_node")).alias("src_node"),
        F.when(rev, F.col("tgt_lat")).otherwise(F.col("src_lat")).alias("src_lat"),
        F.when(rev, F.col("tgt_lng")).otherwise(F.col("src_lng")).alias("src_lng"),
        F.when(rev, F.col("src_node")).otherwise(F.col("tgt_node")).alias("tgt_node"),
        F.when(rev, F.col("src_lat")).otherwise(F.col("tgt_lat")).alias("tgt_lat"),
        F.when(rev, F.col("src_lng")).otherwise(F.col("tgt_lng")).alias("tgt_lng"),
        F.when(rev, F.reverse("geom")).otherwise(F.col("geom")).alias("geom"),
        "direction",
    )

    edges = (
        edges.withColumn("src_cell", cell_expr(F.col("src_lat"), F.col("src_lng"), res))
        .withColumn("tgt_cell", cell_expr(F.col("tgt_lat"), F.col("tgt_lng"), res))
        .withColumn("is_border", F.col("src_cell") != F.col("tgt_cell"))
        .withColumn(
            "edge_id",
            F.col("way_id") * F.lit(2 * MAX_SEGMENTS_PER_WAY)
            + F.col("seg") * 2
            + F.col("direction"),
        )
    )
    return edges.select(
        "edge_id", "way_id", "seg", "direction", "oneway",
        "src_node", "src_lat", "src_lng", "tgt_node", "tgt_lat", "tgt_lng",
        "cost", "n_points", "geom", "src_cell", "tgt_cell", "is_border",
    )


def edge_tile_assignment(edges: DataFrame, res: int) -> DataFrame:
    """Edge → every tile cell its GEOMETRY passes through, via supercover
    rasterization (:func:`operators.spatial_join.polyline_to_cells`).

    The reference lays each edge into per-pixel files before turn
    inversion (reference main.cpp:587-708) keyed by the edge's ENDPOINT
    pixels; this is the stronger geometric version — an edge whose
    polyline cuts a corner of a third cell lands there too, which is
    what a tile-local renderer or map-matcher actually needs.  Pure
    codegen, (edge_id, cell) unique per row, no shuffle.
    """
    from navgraph_osm_spark.operators.spatial_join import polyline_to_cells

    return polyline_to_cells(
        edges.select("edge_id", F.col("geom").alias("geometry")),
        res,
        line_id="edge_id",
    )


def construction_counts(
    nodes: DataFrame, ways: DataFrame, way_nodes: DataFrame, edges: DataFrame
) -> DataFrame:
    """The reference's stderr counters as a metrics DataFrame.

    Mirrors Filestat (reference include/benchmark/filestat.hpp:7-20,
    reported main.cpp:204-222) + per-cell edge counts (main.cpp:916).
    """
    wn = _kept_way_nodes(ways, way_nodes)
    used = node_usage(wn)
    nodes_kept = nodes.join(used, nodes["id"] == used["node_id"], "left_semi")
    return (
        edges.agg(
            F.countDistinct("src_cell").alias("cells_used"),
            F.count("*").alias("edges_emitted"),
            F.countDistinct("way_id").alias("ways_split"),
        )
        .crossJoin(nodes_kept.agg(F.count("*").alias("nodes_kept")))
        .crossJoin(nodes.agg(F.count("*").alias("nodes_total")))
        .crossJoin(filter_ways(ways).agg(F.count("*").alias("ways_used")))
    )
