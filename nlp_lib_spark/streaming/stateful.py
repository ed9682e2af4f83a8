"""Custom stateful streaming operator (``applyInPandasWithState``).

The reference is strictly batch; this is the engine's incremental
conversation tracker, the build brief's "custom stateful operators" slot:
per-``conv_id`` state accumulates across micro-batches — turns seen,
triples extracted, highest turn index — and every batch emits the updated
running totals for the conversations it touched.  State is O(live
conversations), independent of stream length; at ingest scale the same
shape runs against a Kafka source with processing-time timeouts evicting
finished conversations.

Parity contract (tested): after draining any file split of the same
input, the final per-conversation totals equal the batch aggregation —
micro-batch boundaries must be invisible in the accumulated state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nlp_lib_spark.kernels.pipeline import KGConfig, extract_turn
from nlp_lib_spark.streaming.ingest import TRANSCRIPTS_SCHEMA

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_triples", T.LongType()),
    T.StructField("max_turn_idx", T.IntegerType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_triples", T.LongType()),
    T.StructField("max_turn_idx", T.IntegerType()),
])

_RT_CACHE: dict[KGConfig, object] = {}


def _runtime(config: KGConfig):
    rt = _RT_CACHE.get(config)
    if rt is None:
        rt = config.build()
        _RT_CACHE[config] = rt
    return rt


def conversation_state_counts(src: DataFrame,
                              config: KGConfig) -> DataFrame:
    """stream/batch of turns -> running per-conversation totals."""

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        rt = _runtime(config)
        (conv_id,) = key
        if state.exists:
            n_turns, n_triples, max_turn = state.get
        else:
            n_turns, n_triples, max_turn = 0, 0, -1
        for pdf in pdfs:
            for ti, text in zip(pdf["turn_idx"], pdf["text"]):
                n_turns += 1
                max_turn = max(max_turn, int(ti))
                if text:
                    n_triples += len(extract_turn(rt, text))
        state.update((n_turns, n_triples, max_turn))
        yield pd.DataFrame([(conv_id, n_turns, n_triples, max_turn)],
                           columns=["conv_id", "n_turns", "n_triples",
                                    "max_turn_idx"])

    return (src.select("conv_id", "turn_idx", "text")
            .groupBy("conv_id")
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def run_stateful_once(spark: SparkSession, input_dir: str, config: KGConfig,
                      query_name: str = "conv_state",
                      max_files_per_trigger: int = 1) -> DataFrame:
    """Drain the directory one file per micro-batch (so state genuinely
    carries across batches) into a memory sink; return the LAST update
    per conversation (the accumulated totals)."""
    from pyspark.sql import Window, functions as F
    src = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(input_dir))
    q = (conversation_state_counts(src, config)
         .writeStream.outputMode("update")
         .format("memory").queryName(query_name)
         .trigger(availableNow=True)
         .start())
    q.processAllAvailable()
    q.stop()
    # update mode appends one row per touched conversation per batch;
    # the accumulated totals are the max-n_turns row per conversation
    return (spark.sql(f"SELECT * FROM {query_name}")
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy("conv_id").orderBy(F.desc("n_turns"))))
            .filter(F.col("__rn") == 1).drop("__rn"))
