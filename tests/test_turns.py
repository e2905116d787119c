"""Turn expansion vs a pure-Python oracle, incl. restriction scenarios.

The oracle enumerates adjacent edge pairs (a.tgt == b.src), drops exact
geometric U-turns, applies only_*/no_* rules — independently of Spark.
Covers SURVEY.md §2.3 J4-J9 and F6, and the only_* conflict rule
(reference invert.hpp:32-48).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from navgraph_osm_spark.operators.graph_build import build_edges
from navgraph_osm_spark.operators.turn_expand import expand_turns, split_restrictions
from navgraph_osm_spark.sources.synth import gen_road_grid

ROWS, COLS = 5, 5


@pytest.fixture(scope="module")
def grid(spark):
    return gen_road_grid(spark, rows=ROWS, cols=COLS, seed=42)


@pytest.fixture(scope="module")
def edges(spark, grid):
    df = build_edges(grid["nodes"], grid["ways"], grid["way_nodes"], res=12)
    df.cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def turns(edges, grid):
    df = expand_turns(edges, grid["restrictions"])
    df.cache()
    df.count()
    return df


def _oracle(edge_rows, restr_rows):
    by_src = {}
    for e in edge_rows:
        by_src.setdefault(e["src_node"], []).append(e)
    emitted_ways = {e["way_id"] for e in edge_rows}
    no_pairs = {(r["from_way"], r["to_way"]) for r in restr_rows if 0 <= r["type"] <= 2}
    only = {}
    for r in restr_rows:
        if 3 <= r["type"] <= 5 and r["to_way"] in emitted_ways:
            only.setdefault((r["from_way"], r["via_node"]), set()).add(r["to_way"])
    out = set()
    for a in edge_rows:
        for b in by_src.get(a["tgt_node"], []):
            # U-turn: exact coordinate reversal
            if (
                a["src_lat"] == b["tgt_lat"]
                and a["src_lng"] == b["tgt_lng"]
                and a["tgt_lat"] == b["src_lat"]
                and a["tgt_lng"] == b["src_lng"]
            ):
                continue
            key = (a["way_id"], a["tgt_node"])
            if key in only:
                tos = only[key]
                if len(tos) > 1 or b["way_id"] not in tos:
                    continue
            if (a["way_id"], b["way_id"]) in no_pairs:
                continue
            out.add((a["edge_id"], b["edge_id"]))
    return out


def test_turns_match_oracle(turns, edges, grid):
    got = {(r["src_edge_id"], r["tgt_edge_id"]) for r in turns.collect()}
    want = _oracle(edges.collect(), grid["restrictions"].collect())
    assert got == want
    assert len(got) > 0


def test_turn_costs(turns, edges):
    costs = {r["edge_id"]: r["cost"] for r in edges.collect()}
    for t in turns.collect():
        assert abs(t["cost"] - (costs[t["src_edge_id"]] + costs[t["tgt_edge_id"]]) / 2) < 1e-12


def test_only_conflict_kills_all(turns, edges, grid):
    """Restrictions 5+6 share (from_way, via_node) with different to-ways →
    NO turn from way 1004 at node (4,2) may survive (invert.hpp:32-48)."""
    h4 = 1000 + 4
    via = 4 * COLS + 2
    bad = turns.filter((F.col("from_way") == h4) & (F.col("via_node") == via)).count()
    assert bad == 0


def test_only_restriction_enforced(turns):
    """Restriction 2: from way 1001 via node (1,1) only onto vertical way v1."""
    v1 = 1000 + ROWS + 1
    via = 1 * COLS + 1
    tos = {
        r["to_way"]
        for r in turns.filter(
            (F.col("from_way") == 1001) & (F.col("via_node") == via)
        ).collect()
    }
    assert tos == {v1}


def test_no_restriction_enforced(turns):
    """Restriction 1: no turn from way 1002 onto vertical way v2."""
    v2 = 1000 + ROWS + 2
    assert (
        turns.filter((F.col("from_way") == 1002) & (F.col("to_way") == v2)).count() == 0
    )


def test_dangling_only_dropped(edges, grid):
    """Restriction 4 points to way 99999 (no edges) → J7 semi join drops it,
    so turns from way 1003 at its via node are NOT restricted."""
    no_rest, only_agg = split_restrictions(grid["restrictions"], edges)
    keys = {(r["from_way"], r["via_node"]) for r in only_agg.collect()}
    assert (1003, 3 * COLS + 1) not in keys


def test_exp_edge_ids_unique(turns):
    n = turns.count()
    assert turns.select("exp_edge_id").distinct().count() == n


def test_strict_only_first_match(spark):
    """Strict reference-output mode (invert.hpp:51-56): a bidirectional
    mandated to-way through the via node has TWO outgoing edges; default
    (set semantics) emits both expanded edges, strict mode emits exactly
    one — the minimum tgt_edge_id, the deterministic stand-in for the
    reference's file-order find_if."""
    edge_cols = (
        "edge_id long, way_id long, cost double, src_node long, tgt_node long, "
        "src_cell long, tgt_cell long, src_lat double, src_lng double, "
        "tgt_lat double, tgt_lng double"
    )
    V = 100  # via node at (0, 0)
    edges = spark.createDataFrame(
        [
            # source edge on way 1, ending at V
            (10, 1, 1.0, 101, V, 7, 7, 1.0, 0.0, 0.0, 0.0),
            # to-way 2 is bidirectional through V: two outgoing edges
            (21, 2, 2.0, V, 102, 7, 7, 0.0, 0.0, 0.0, 1.0),
            (22, 2, 2.0, V, 103, 7, 7, 0.0, 0.0, 0.0, -1.0),
            # an unrelated outgoing way at V (must be suppressed by only_*)
            (31, 3, 3.0, V, 104, 7, 7, 0.0, 0.0, 1.0, 1.0),
        ],
        edge_cols,
    )
    restrictions = spark.createDataFrame(
        [(1, 1, V, 2, 3)],  # only_* (type 3): from way 1 via V onto way 2
        "id long, from_way long, via_node long, to_way long, type int",
    )
    default_pairs = {
        (r["src_edge_id"], r["tgt_edge_id"])
        for r in expand_turns(edges, restrictions).collect()
    }
    strict_pairs = {
        (r["src_edge_id"], r["tgt_edge_id"])
        for r in expand_turns(edges, restrictions, strict_only=True).collect()
    }
    assert default_pairs == {(10, 21), (10, 22)}
    assert strict_pairs == {(10, 21)}  # min tgt_edge_id wins


def test_strict_only_uturn_selection_no_fallback(spark):
    """Strict mode mirrors the reference's `return` after find_if: if the
    FIRST matching edge of the mandated to-way is the U-turn reversal of
    the source, nothing is emitted — no fallback to the next edge (default
    set semantics still emits the non-U-turn one)."""
    edge_cols = (
        "edge_id long, way_id long, cost double, src_node long, tgt_node long, "
        "src_cell long, tgt_cell long, src_lat double, src_lng double, "
        "tgt_lat double, tgt_lng double"
    )
    V = 200
    edges = spark.createDataFrame(
        [
            # source edge on way 1: (5,5) -> V at (0,0)
            (10, 1, 1.0, 201, V, 7, 7, 5.0, 5.0, 0.0, 0.0),
            # mandated way 2, FIRST edge (min id 20) is the exact reversal
            # of the source: (0,0) -> (5,5)
            (20, 2, 1.0, V, 201, 7, 7, 0.0, 0.0, 5.0, 5.0),
            # second edge of way 2 is a genuine turn
            (25, 2, 2.0, V, 202, 7, 7, 0.0, 0.0, 0.0, 9.0),
        ],
        edge_cols,
    )
    restrictions = spark.createDataFrame(
        [(1, 1, V, 2, 4)],
        "id long, from_way long, via_node long, to_way long, type int",
    )
    default_pairs = {
        (r["src_edge_id"], r["tgt_edge_id"])
        for r in expand_turns(edges, restrictions).collect()
    }
    strict_pairs = {
        (r["src_edge_id"], r["tgt_edge_id"])
        for r in expand_turns(edges, restrictions, strict_only=True).collect()
    }
    assert default_pairs == {(10, 25)}
    assert strict_pairs == set()


def test_strict_interactions_single_via_node(spark):
    """The STRICT_TURNS.md fixture pack: every only_*/no_*/U-turn
    interaction class planted on ONE shared via node, evaluated in one
    expand_turns call — proves rule scoping by (from_way, via_node) never
    leaks across source edges and each case matches the reference's
    applyRestrictions early-return flow (invert.hpp:27-113).  See
    STRICT_TURNS.md for the case-by-case reference mapping."""
    edge_cols = (
        "edge_id long, way_id long, cost double, src_node long, tgt_node long, "
        "src_cell long, tgt_cell long, src_lat double, src_lng double, "
        "tgt_lat double, tgt_lng double"
    )
    V = 500  # via node at (0,0), cell 7
    edges = spark.createDataFrame(
        [
            # source edges S1..S8 (ways 1..8), each ending at V
            (101, 1, 1.0, 511, V, 7, 7, 1.0, 0.0, 0.0, 0.0),
            (102, 2, 1.0, 512, V, 7, 7, 2.0, 0.0, 0.0, 0.0),
            (103, 3, 1.0, 513, V, 7, 7, 3.0, 0.0, 0.0, 0.0),
            (104, 4, 1.0, 514, V, 7, 7, 4.0, 0.0, 0.0, 0.0),
            (105, 5, 1.0, 515, V, 7, 7, 5.0, 0.0, 0.0, 0.0),
            (106, 6, 1.0, 516, V, 7, 7, 6.0, 0.0, 0.0, 0.0),
            (107, 7, 1.0, 517, V, 7, 7, 8.0, 0.0, 0.0, 0.0),
            (108, 8, 1.0, 518, V, 7, 7, 0.0, 9.0, 0.0, 0.0),
            # outgoing edges at V
            (201, 20, 2.0, V, 521, 7, 7, 0.0, 0.0, 0.0, 1.0),
            (202, 20, 2.0, V, 522, 7, 7, 0.0, 0.0, 0.0, -1.0),
            (301, 30, 2.0, V, 523, 7, 7, 0.0, 0.0, 1.0, 1.0),
            (401, 40, 2.0, V, 524, 7, 7, 0.0, 0.0, 1.0, -1.0),
            # way 60's sole outgoing edge: exact reversal of S6
            (601, 60, 2.0, V, 516, 7, 7, 0.0, 0.0, 6.0, 0.0),
            # way 80: reverses S8 via a DIFFERENT node id, SAME coordinates
            (801, 80, 2.0, V, 529, 7, 7, 0.0, 0.0, 0.0, 9.0),
            # way 99 exists (survives J7) but only at a DIFFERENT node
            (901, 99, 2.0, 531, 532, 8, 8, 7.0, 7.0, 7.0, 8.0),
        ],
        edge_cols,
    )
    rest_rows = [
        (1, 1, V, 20, 3),    # S1: only → 20
        (2, 2, V, 20, 4),    # S2: only → 20 ...
        (3, 2, 20, 0),       # ... AND no_*(2, 20)  (from,to,type) below
        (4, 3, V, 20, 3),    # S3: conflicting onlys
        (5, 3, V, 30, 3),
        (6, 4, V, 30, 4),    # S4: duplicate onlys (allEq)
        (7, 4, V, 30, 5),
        (8, 5, V, 99, 3),    # S5: only → way with no outgoing at V
        (9, 6, V, 60, 3),    # S6: only → the U-turn way
        (10, 7, 30, 1),      # S7: no_*(7, 30)  (from,to,type) below
        (11, 7, V, 40, -1),  # S7: INVALID type → must be ignored (F4)
    ]
    # normalize: no_* rows above written as (id, from, to, type)
    norm = []
    for r in rest_rows:
        if len(r) == 4:
            rid, fw, tw, ty = r
            norm.append((rid, fw, V, tw, ty))
        else:
            norm.append(r)
    restrictions = spark.createDataFrame(
        norm, "id long, from_way long, via_node long, to_way long, type int"
    )

    def pairs(strict):
        return {
            (r["src_edge_id"], r["tgt_edge_id"])
            for r in expand_turns(edges, restrictions, strict_only=strict).collect()
        }

    strict = pairs(True)
    default = pairs(False)

    want_strict = {
        (101, 201),                                    # S1: first match only
        (104, 301),                                    # S4: duplicates collapse
        (107, 201), (107, 202), (107, 401), (107, 601), (107, 801),  # S7
        (108, 201), (108, 202), (108, 301), (108, 401), (108, 601),  # S8
    }
    assert strict == want_strict
    # default differs ONLY for S1 (set semantics on the mandated way)
    assert default == want_strict | {(101, 202)}
    # leak checks called out explicitly:
    assert not any(s == 102 for s, _ in strict)   # S2: no fallback after no_*
    assert not any(s == 103 for s, _ in strict)   # S3: conflict kills all
    assert not any(s == 105 for s, _ in strict)   # S5: find_if miss
    assert not any(s == 106 for s, _ in strict)   # S6: U-turn selection
    assert (107, 401) in strict                   # type -1 row ignored (F4)
    assert (108, 801) not in strict               # coordinate-based U-turn
