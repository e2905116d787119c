"""Structured Streaming operators over the events table.

The reference is single-shot batch (SURVEY.md §2.8) — streaming here is the
engine's incremental-ingest extension: watermark + tumbling-window aggregates
and gap-based sessionization, runnable in tests via the in-memory sink with
``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .load(path)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Late-data-tolerant tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user (built-in session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


RUNNING_STATS_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
_STATE_SCHEMA = "n long, total double, mx double"


def running_user_stats(
    events: DataFrame, watermark: str = "2 hours", timeout_minutes: int | None = None
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, max) maintained across micro-batches.

    This is the arbitrary-state surface (SURVEY §2.8/§2.9) for operators the
    built-in windows can't express — per-key models, decaying counters,
    custom session logic.  State is a 3-tuple per user; each micro-batch
    updates it from the user's new rows (Arrow-batched) and emits the
    running totals.

    ``timeout_minutes`` (production knob) expires idle users via a
    processing-time timeout so state stays bounded; note it keeps the query
    triggering cleanup micro-batches even with no new data, so leave it None
    for drain-to-completion test runs.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"user_id": [], "n_events": [], "total_value": [], "max_value": []}
            )
            return
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "append") -> None:
    """Drive a streaming plan to completion against current files (tests).

    Note append mode holds windows newer than the watermark in state (they
    emit only when later data advances it) — use ``mode='complete'`` when a
    test needs every window materialized.
    """
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
