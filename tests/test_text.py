"""Text functions: Spark expr ↔ DuckDB SQL byte-equality on real testdata."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from navgraph_osm_spark.functions import text as X

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def _compare(spark_df, duck, sql, key="doc_id"):
    got = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    want = duck.execute(sql).df().sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert (abs(got[c] - want[c]) < 1e-9).all(), c
        else:
            assert (got[c] == want[c]).all(), c


def test_token_count_parity(docs, duck):
    _compare(
        docs.select("doc_id", X.token_count_expr(F.col("text")).alias("n_tokens")),
        duck,
        f"SELECT doc_id, {X.token_count_sql('text')} AS n_tokens FROM documents",
    )


def test_quality_score_parity(docs, duck):
    _compare(
        docs.select("doc_id", X.quality_score_expr(F.col("text")).alias("quality")),
        duck,
        f"SELECT doc_id, {X.quality_score_sql('text')} AS quality FROM documents",
    )


def test_lang_scores_parity(docs, duck):
    for lang in ("en", "de", "zh"):
        _compare(
            docs.select("doc_id", X.lang_score_expr(F.col("text"), lang).alias("score")),
            duck,
            f"SELECT doc_id, {X.lang_score_sql('text', lang)} AS score FROM documents",
        )


def test_fingerprint_parity(docs, duck):
    _compare(
        docs.select("doc_id", X.fingerprint_expr(F.col("text")).alias("fp")),
        duck,
        f"SELECT doc_id, {X.fingerprint_sql('text')} AS fp FROM documents",
    )


def test_stopword_ratio_parity(docs, duck):
    _compare(
        docs.select("doc_id", X.stopword_ratio_expr(F.col("text")).alias("ratio")),
        duck,
        f"SELECT doc_id, {X.stopword_ratio_sql('text')} AS ratio FROM documents",
    )


def test_winnow_fingerprints_edit_robust(spark):
    """Documents sharing a long substring share winnow fingerprints even
    after local edits; whole-document md5 does not."""
    from navgraph_osm_spark.functions.text import (
        fingerprint_expr,
        winnow_fingerprints_expr,
    )

    shared = "the quick brown fox jumps over the lazy dog near the river bank "
    docs = spark.createDataFrame(
        [(1, "PREFIX A " + shared + "tail one"),
         (2, "other start " + shared + "different ending entirely")],
        "doc_id long, text string",
    )
    out = docs.select(
        "doc_id",
        fingerprint_expr(F.col("text")).alias("md5fp"),
        winnow_fingerprints_expr(F.col("text")).alias("wfp"),
    ).collect()
    a, b = out[0], out[1]
    assert a["md5fp"] != b["md5fp"]
    overlap = set(a["wfp"]) & set(b["wfp"])
    assert len(overlap) >= 5, (len(a["wfp"]), len(b["wfp"]), len(overlap))


def test_winnow_short_and_empty_texts(spark):
    from navgraph_osm_spark.functions.text import winnow_fingerprints_expr

    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "abcd"), (4, "abcdefgh")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["w"] for r in docs.select(
        "doc_id", winnow_fingerprints_expr(F.col("text")).alias("w")).collect()}
    for did, w in rows.items():
        assert len(w) >= 1, did  # every doc yields at least one fingerprint
