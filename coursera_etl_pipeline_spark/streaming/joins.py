"""Stream-stream interval join (attribution): pair each 'view' event
with the same user's 'click' events that follow within a bounded gap.

The SAME plan runs batch or streaming: `withWatermark` is a no-op on a
batch DataFrame, and Structured Streaming executes the identical join
incrementally. In streaming mode the watermarks + the two-sided time
bound are what make state finite — each side can discard buffered rows
once the other side's watermark passes `ts + gap` (Spark derives the
state eviction predicate from the join condition), so state size is
O(events per gap window), not O(stream length). Without the upper
bound on `c.ts` the join would be rejected in append mode: unbounded
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(views: DataFrame, clicks: DataFrame, gap: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Inner interval join: click strictly after the view, at most
    `gap` later, same user. Returns one row per (view, click) pair."""
    v = views.withWatermark("ts", watermark).alias("v")
    c = clicks.withWatermark("ts", watermark).alias("c")
    return (
        v.join(
            c,
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") > F.col("v.ts"))
            & (F.col("c.ts") <= F.col("v.ts") + F.expr(f"INTERVAL {gap}")),
            "inner")
        .select(
            F.col("v.event_id").alias("view_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("v.user_id").alias("user_id"),
            F.date_format("v.ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("c.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            (F.unix_timestamp("c.ts") - F.unix_timestamp("v.ts")).alias("delay_sec"),
        )
    )
