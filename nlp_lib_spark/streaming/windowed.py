"""Watermarked windowed aggregation over the transcript stream.

The reference has no streaming surface (SURVEY.md §2.8); this is the
engine's late-data-tolerant monitoring aggregate: turns per
(event-time window, role) with a watermark bounding state. State size
is O(open windows x roles) regardless of stream length — the watermark
lets Spark drop windows older than the lateness bound, which is what
makes the aggregate runnable forever at ingest scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from nlp_lib_spark.streaming.ingest import TRANSCRIPTS_SCHEMA


def windowed_turn_counts(src: DataFrame, window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """turns per (window, role); works on a stream or a batch frame (the
    watermark is a no-op in batch, which is what makes the
    streaming==batch parity test exact)."""
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "role")
            .agg(F.count(F.lit(1)).alias("n_turns"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "role", "n_turns"))


def run_windowed_once(spark: SparkSession, input_dir: str,
                      query_name: str = "turn_rates") -> DataFrame:
    """Drain the directory through the watermarked aggregate into a
    memory sink (complete mode: the test sink holds final counts)."""
    src = (spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir))
    q = (windowed_turn_counts(src)
         .writeStream.outputMode("complete")
         .format("memory").queryName(query_name)
         .trigger(availableNow=True)
         .start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
