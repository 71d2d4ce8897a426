"""Gap-based sessionization (B-series extension).

The classic event-stream operator: a user's events split into sessions
wherever the inter-event gap exceeds ``gap``.  Expressed entirely as
window functions - lag -> new-session flag -> running sum - so Catalyst
plans ONE hash shuffle on the user key and two window passes over it;
no UDFs, no iteration.

Scale shape: the single shuffle is keyed on ``user_id`` (the natural
partitioning for event analytics); skewed power-users are bounded by
their own event counts, not the table size.  Timestamps are compared in
integer microseconds (``unix_micros``) so the engine-vs-oracle math is
exact - no float time arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(events: DataFrame, gap_us: int = DEFAULT_GAP_US,
               user_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Assign a per-user session index; returns one row per event with
    ``session_id`` attached (0-based per user, ordered by time)."""
    # testdata timestamps are TIMESTAMP_NTZ; the cast binds them to the
    # session timezone (build_session pins UTC) so unix_micros matches
    # DuckDB's epoch_us over the same naive values
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(user_col)
         .orderBy(us.asc(), F.col(order_tiebreak).asc()))
    prev = F.lag(us).over(w)
    new_session = F.when(prev.isNull() | ((us - prev) > gap_us), 1) \
        .otherwise(0)
    running = (Window.partitionBy(user_col)
               .orderBy(us.asc(), F.col(order_tiebreak).asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.withColumn("_us", us).withColumn(
        "session_id", (F.sum(new_session).over(running) - 1).cast("long"))


def session_stats(events: DataFrame, gap_us: int = DEFAULT_GAP_US,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """One row per (user, session): event count, exact microsecond span,
    and the value total in integer cents (float sums are engine-order
    dependent; ``round(value*100)`` per row is exact for 2-decimal data).
    """
    sess = sessionize(events, gap_us, user_col, ts_col)
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (sess
            .groupBy(user_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("_us").alias("start_us"),
                 F.max("_us").alias("end_us"),
                 F.sum(cents).alias("value_cents")))
