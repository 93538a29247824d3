"""Event sessionization: gap-based sessions over the events stream.

The standard event-pipeline reshape: per user, a new session starts when
the gap to the previous event exceeds ``gap_minutes``; sessions aggregate
to (user_id, session start/end, event count). One shuffle (the window's
hash partition on user_id) + the session aggregation reusing the same
partitioning — Catalyst collapses them into a single exchange. Ties are
broken by event_id, so the session assignment is deterministic and
SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """events -> one row per (user, session): start/end/event count."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    # exact integer microsecond gap — unambiguous across engines
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) \
        - F.unix_micros(prev.cast("timestamp"))
    new_sess = F.when(prev.isNull()
                      | (gap_us > gap_minutes * 60 * 1_000_000), 1) \
        .otherwise(0)
    sess = (events
            .withColumn("_new", new_sess)
            .withColumn("session_id",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"   # fixed-width fraction
    return (sess.groupBy(user_col, "session_id")
            .agg(F.date_format(F.min(ts_col), fmt).alias("session_start"),
                 F.date_format(F.max(ts_col), fmt).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.min(id_col).alias("first_event"))
            .select(user_col, F.col("session_id").cast("int")
                    .alias("session_id"),
                    "session_start", "session_end", "n_events",
                    "first_event"))
