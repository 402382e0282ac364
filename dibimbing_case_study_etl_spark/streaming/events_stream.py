"""Event-stream analytics: watermarked tumbling-window aggregation and
session windows over the ``events`` table schema.

The batch twins live in the query registry (q26_events_hourly,
q27_events_sessionize); these streaming forms handle unbounded input with
bounded state — the watermark ages out window state once event time passes
window_end + delay, which is what makes the operator viable on an
unbounded 100 TB/day stream.
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


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with late-data tolerance
    ``watermark`` (streaming twin of q26)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.call_function("rint", F.col("value") * 100).cast("bigint")) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap (streaming
    twin of q27's gaps-and-islands; ``session_window`` keeps state only for
    open sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def view_purchase_attribution(
    views: DataFrame, purchases: DataFrame, horizon: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's views in the preceding ``horizon``.

    Both inputs are watermarked and the join carries an event-time range
    condition — that pair is what bounds the state store: Spark can drop a
    buffered view once the watermark passes view.ts + horizon, so state
    stays O(events in the horizon window) regardless of total stream
    length. Without the time bound a stream-stream join would buffer both
    streams forever.
    """
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts > view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
    ).select(
        F.col("v_user").alias("user_id"), "view_id", "view_ts", "purchase_id", "purchase_ts", "amount"
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension — no state store involved (the static side is just
    re-scanned or broadcast per batch), so this is the cheap join shape
    and the right one whenever the dim is slowly-changing and small
    relative to the stream. Unlike a stream-stream join it needs no
    watermark."""
    return events.join(dim, on, "left")


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",), watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: drop key-duplicates arriving within the
    watermark of each other (``dropDuplicatesWithinWatermark``). This is
    the unbounded-input form of the north-star exact dedup (d01): plain
    ``dropDuplicates`` on a stream would keep every key seen forever,
    while the watermark variant ages key state out once event time passes
    ts + delay — bounded state on an unbounded feed, correct whenever
    duplicates (retries, at-least-once upstream delivery) arrive within
    the watermark of the original."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def run_to_memory(agg: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drive a streaming aggregation over all available input synchronously
    into an in-memory table (test/smoke harness)."""
    q = agg.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
