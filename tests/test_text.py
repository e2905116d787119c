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
