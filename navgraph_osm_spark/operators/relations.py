"""Relation parsing: F3 restriction role pivot + tag-map way predicates.

Re-expresses the reference's raw-relation handling (reference
include/mt/parse/worker.hpp:223-307) as declarative DataFrame ops.  Input is
the raw OSM-shaped relation surface:

- ``members``:  (rel_id, seq, member_type, role, member_id) — one row per
  relation member, ``member_type`` ∈ {'node','way','relation'}; member ids
  are assumed already delta-decoded (S3 handles that upstream, the analogue
  of worker.hpp:251-270's ``prevId`` accumulation).
- ``rel_tags``: (rel_id, tags map<string,string>) — the string-table tag
  pairs (worker.hpp:226-237).

Validation mirrors the reference exactly:

1. relation carries a ``restriction`` tag          (worker.hpp:228-237)
2. exactly 3 members                               (worker.hpp:243-245)
3. roles pivot with **last-wins** assignment:      (worker.hpp:252-270)
   from → member_type 'way', to → 'way', via → 'node'; a later member with
   the same role overwrites an earlier one
4. from/via/to all present                         (worker.hpp:273-275)
5. restriction type string ∈ the 6-type table      (worker.hpp:277-287)
6. type encoding (worker.hpp:289-302): no_right_turn=0, no_left_turn=1,
   no_straight_on=2, only_left_turn=3, only_right_turn=4, only_straight_on=5

All of it is one groupBy + one broadcastable join + pure column expressions
— relations are tiny relative to ways/nodes (reference buffer constants
disk/utils.hpp:17-19), so this never shuffles anything big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference worker.hpp:289-302 (note only_left=3 / only_right=4 — the
# reference's encode order differs from its decode-string order)
RESTRICTION_TYPE_CODES = {
    "no_right_turn": 0,
    "no_left_turn": 1,
    "no_straight_on": 2,
    "only_left_turn": 3,
    "only_right_turn": 4,
    "only_straight_on": 5,
}


def _type_code_expr(rtype):
    pairs = []
    for name, code in RESTRICTION_TYPE_CODES.items():
        pairs += [F.lit(name), F.lit(code)]
    return F.try_element_at(F.create_map(*pairs), rtype)


def pivot_restrictions(members: DataFrame, rel_tags: DataFrame) -> DataFrame:
    """F3: raw members + relation tags → (id, from_way, via_node, to_way, type).

    Only valid restrictions are emitted (type is never -1 here — unknown
    type strings are filtered, matching worker.hpp:277-287 where invalid
    relations are skipped before the encode).
    """

    def pick(role: str, mtype: str):
        # last-wins within the member sequence (worker.hpp loop order)
        matches = F.filter(
            F.col("ms"),
            lambda m: (m["role"] == role) & (m["member_type"] == mtype),
        )
        # try_element_at: empty match array -> NULL (ANSI-safe)
        return F.try_element_at(matches, F.lit(-1))["member_id"]

    pivoted = (
        members.groupBy("rel_id")
        .agg(
            F.count("*").alias("n_members"),
            F.array_sort(
                F.collect_list(F.struct("seq", "member_type", "role", "member_id"))
            ).alias("ms"),
        )
        .select(
            "rel_id",
            "n_members",
            pick("from", "way").alias("from_way"),
            pick("via", "node").alias("via_node"),
            pick("to", "way").alias("to_way"),
        )
    )
    rtype = F.try_element_at(F.col("tags"), F.lit("restriction"))
    tagged = rel_tags.select("rel_id", rtype.alias("rtype")).filter(
        F.col("rtype").isNotNull()
    )
    return (
        pivoted.join(tagged, "rel_id")
        .filter(
            (F.col("n_members") == 3)
            & F.col("from_way").isNotNull()
            & F.col("via_node").isNotNull()
            & F.col("to_way").isNotNull()
        )
        .select(
            F.col("rel_id").alias("id"),
            "from_way",
            "via_node",
            "to_way",
            _type_code_expr(F.col("rtype")).cast("int").alias("type"),
        )
        .filter(F.col("type").isNotNull())
    )
