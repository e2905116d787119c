"""F3 restriction role pivot + MapType-tags F1/F2 (reference worker.hpp:92-307)."""

from __future__ import annotations

import pytest

from navgraph_osm_spark.operators.graph_build import filter_ways, filter_ways_tags
from navgraph_osm_spark.operators.relations import pivot_restrictions
from navgraph_osm_spark.sources.synth import gen_road_grid


@pytest.fixture(scope="module")
def grid(spark):
    return gen_road_grid(spark, rows=5, cols=5)


def test_pivot_emits_only_valid_restrictions(grid):
    got = {r["id"]: r for r in grid["restrictions"].collect()}
    # the 6 valid raw relations survive with correct pivot + encoding
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert (got[1]["from_way"], got[1]["via_node"], got[1]["to_way"], got[1]["type"]) == (
        1002, 12, 1007, 0
    )
    assert got[2]["type"] == 3 and got[3]["type"] == 4  # only_left=3, only_right=4
    assert got[4]["to_way"] == 99999 and got[4]["type"] == 5


def test_pivot_drops_invalid_relations(grid):
    # rel 90: no restriction tag; 91: 4 members; 92: via has WAY member type;
    # 93: type string outside the 6-type table; 94: only 2 members / no 'to'
    ids = {r["id"] for r in grid["restrictions"].collect()}
    assert ids.isdisjoint({90, 91, 92, 93, 94})


def test_pivot_last_wins(spark):
    # two 'from' WAY members: the later one wins; with roles from/from/via
    # there is no 'to' → dropped; from/via/to with duplicate... use a valid
    # set where 'from' appears once, then verify a doubled 'via' NODE keeps
    # the later node id (3 members, all roles present via last-wins is
    # impossible — so check the overwrite through a doubled role that still
    # leaves the relation invalid, plus a direct 3-member valid one)
    members = spark.createDataFrame(
        [
            (1, 0, "way", "from", 10),
            (1, 1, "node", "via", 20),
            (1, 2, "way", "to", 30),
        ],
        "rel_id long, seq int, member_type string, role string, member_id long",
    )
    tags = spark.createDataFrame(
        [(1, {"restriction": "no_straight_on"})], "rel_id long, tags map<string,string>"
    )
    row = pivot_restrictions(members, tags).collect()[0]
    assert (row["from_way"], row["via_node"], row["to_way"], row["type"]) == (10, 20, 30, 2)


def test_filter_ways_tags_matches_flat(grid):
    flat = {(r["way_id"], r["oneway"]) for r in filter_ways(grid["ways"]).collect()}
    tagged = {
        (r["way_id"], r["oneway"]) for r in filter_ways_tags(grid["ways_tags"]).collect()
    }
    assert flat == tagged
    assert len(flat) == 10  # 5 horizontal + 5 vertical; noise ways dropped


def test_filter_ways_dispatches_on_tags_column(grid):
    via_dispatch = {
        (r["way_id"], r["oneway"]) for r in filter_ways(grid["ways_tags"]).collect()
    }
    direct = {
        (r["way_id"], r["oneway"]) for r in filter_ways_tags(grid["ways_tags"]).collect()
    }
    assert via_dispatch == direct


def test_missing_oneway_tag_means_twoway(spark):
    ways = spark.createDataFrame(
        [(1, {"highway": "primary"}), (2, {"highway": "primary", "oneway": "yes"})],
        "id long, tags map<string,string>",
    )
    got = {r["way_id"]: r["oneway"] for r in filter_ways_tags(ways).collect()}
    assert got == {1: False, 2: True}


def test_pivot_fuzz_matches_python_reference(spark):
    """Property fuzz: the DataFrame pivot equals a direct python re-implementation
    of the reference loop (worker.hpp:223-307) on randomized raw relations."""
    import numpy as np

    from navgraph_osm_spark.operators.relations import RESTRICTION_TYPE_CODES

    rng = np.random.default_rng(99)
    roles = ["from", "via", "to", "outer"]
    mtypes = ["way", "node", "relation"]
    tstrs = list(RESTRICTION_TYPE_CODES) + ["no_u_turn", None]
    # the canonical valid layout, perturbed with 25%-per-field noise so both
    # valid restrictions and every invalidity class appear
    canon = [("from", "way"), ("via", "node"), ("to", "way")]
    member_rows, tag_rows = [], []
    for rid in range(300):
        n_members = int(rng.choice([2, 3, 3, 3, 4]))
        for seq in range(n_members):
            role, mtype = canon[seq % 3]
            if rng.random() < 0.25:
                role = roles[int(rng.integers(0, 4))]
            if rng.random() < 0.25:
                mtype = mtypes[int(rng.integers(0, 3))]
            member_rows.append((rid, seq, mtype, role, int(rng.integers(1, 50))))
        ts = tstrs[int(rng.integers(0, len(tstrs)))]
        tag_rows.append((rid, {"restriction": ts} if ts is not None else {"type": "route"}))

    # python reference: last-wins pivot + validation, mirroring the C++ loop
    want = {}
    by_rel: dict[int, list] = {}
    for rid, seq, mt, role, mid in member_rows:
        by_rel.setdefault(rid, []).append((seq, mt, role, mid))
    tags = dict(tag_rows)
    for rid, ms in by_rel.items():
        rtype = tags[rid].get("restriction")
        if rtype is None or len(ms) != 3:
            continue
        fr = via = to = None
        for _, mt, role, mid in sorted(ms):
            if role == "from" and mt == "way":
                fr = mid
            elif role == "to" and mt == "way":
                to = mid
            elif role == "via" and mt == "node":
                via = mid
        if fr is None or via is None or to is None:
            continue
        if rtype not in RESTRICTION_TYPE_CODES:
            continue
        want[rid] = (fr, via, to, RESTRICTION_TYPE_CODES[rtype])

    members = spark.createDataFrame(
        member_rows,
        "rel_id long, seq int, member_type string, role string, member_id long",
    )
    rel_tags = spark.createDataFrame(tag_rows, "rel_id long, tags map<string,string>")
    got = {
        r["id"]: (r["from_way"], r["via_node"], r["to_way"], r["type"])
        for r in pivot_restrictions(members, rel_tags).collect()
    }
    assert got == want
    assert len(want) > 5  # the fuzz actually produced valid restrictions
