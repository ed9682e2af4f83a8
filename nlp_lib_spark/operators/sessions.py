"""Conversation sessionization: event-time gap windows (round 5).

A transcripts pipeline at 10^12-turn scale rarely gets clean
conversation boundaries from the producer — agent frameworks reuse
conv_ids across days.  The standard repair is SESSIONIZATION: split
each conv_id's turn stream wherever consecutive event times are more
than a gap apart.  Two certified implementations share ONE oracle:

* batch (:func:`sessionize`): the classic islands-and-gaps SQL — per
  conversation, ``lag(ts)`` marks a break when the gap exceeds the
  threshold, a running sum of breaks numbers the islands, and one
  groupBy collapses each island to (start, end, n_turns).  Scale shape:
  both windows partition by conv_id (bounded conversations, no global
  window), then one aggregation with map-side combine.
* streaming (streaming/ingest.stream_sessions): Structured Streaming's
  ``session_window(ts, gap)`` with a watermark, append mode — Spark's
  native merging session windows.  ``window.end`` is ``max_ts + gap``
  per the semantics, so the drain subtracts the gap to expose the same
  ``session_end = max(ts)`` the batch side emits.

The two definitions agree exactly: with turns sorted by ts inside a
conversation, "break when ts > prev_ts + gap" is the same partition as
session_window's merging, whose window end is INCLUSIVE — an event
exactly gap after the last one still merges (verified empirically;
tests/test_sessions.py pins the boundary on both paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nlp_lib_spark.operators.viewsql import sql_over

#: gap (seconds) that splits two turns into different sessions
SESSION_GAP_S = 1800


def session_ts_sql(dialect: str, doc_id: str = "doc_id") -> str:
    """The gate corpus' synthesized event time over ``documents`` —
    shared by both gates and the oracle.  The stock transcripts ts is a
    uniform 100 s grid (degenerate for sessionization), so the gate
    instead walks each conversation in 60 s steps and inserts an hour
    jump every (2 + conv % 3) turns: conversations therefore carry
    different session lengths, and every conversation has several
    sessions."""
    conv = f"CAST({doc_id} % 100 AS INT)"
    turn = f"CAST(floor({doc_id} / 100.0) AS INT)"
    idiv = "DIV" if dialect == "spark" else "//"
    off = (f"({turn} * 60 + ({turn} {idiv} (2 + {conv} % 3)) * 3600"
           f" + ({conv} % 7) * 13)")
    if dialect == "spark":
        return (f"timestampadd(SECOND, {off}, "
                f"TIMESTAMP '2024-01-01 00:00:00')")
    return f"TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ({off}) SECOND"


def sessionize_sql(dialect: str, source: str,
                   gap_seconds: int = SESSION_GAP_S) -> str:
    """Batch islands-and-gaps in either dialect over ``source``
    (conv_id, ts)."""
    epoch = "unix_timestamp" if dialect == "spark" else "epoch"
    return f"""
WITH l AS (
  SELECT conv_id, ts,
         lag(ts) OVER (PARTITION BY conv_id ORDER BY ts) AS prev
  FROM {source} sq
),
f AS (
  SELECT conv_id, ts,
         CASE WHEN prev IS NULL
                   OR {epoch}(ts) - {epoch}(prev) > {gap_seconds}
              THEN 1 ELSE 0 END AS brk
  FROM l
),
s AS (
  SELECT conv_id, ts,
         sum(brk) OVER (PARTITION BY conv_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS sid
  FROM f
)
SELECT conv_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_turns
FROM s GROUP BY conv_id, sid
"""


def sessionize(df: DataFrame,
               gap_seconds: int = SESSION_GAP_S) -> DataFrame:
    """Batch sessionization of (conv_id, ts) rows; one row per session:
    (conv_id, session_start, session_end, n_turns)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive: {gap_seconds}")
    return sql_over(df.select("conv_id", "ts"),
                    sessionize_sql("spark", "{t}", gap_seconds),
                    prefix="sessionize")
