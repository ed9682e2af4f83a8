"""Custom stateful streaming operator (``applyInPandasWithState``).

The reference is strictly batch; this is the engine's incremental
conversation tracker, the build brief's "custom stateful operators" slot:
per-``conv_id`` state accumulates across micro-batches — turns seen,
triples extracted, highest turn index — and every batch emits the updated
running totals for the conversations it touched.  With
``idle_timeout_ms`` set, processing-time timeouts EVICT conversations
idle longer than the budget (one final totals row is emitted, then the
state row is removed), keeping state O(live conversations) on an
unbounded source; without it (the deterministic parity-test mode) state
is O(all conversations seen) and the source must be bounded.

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


def make_state_fn(config: KGConfig, idle_timeout_ms: int | None = None):
    """The applyInPandasWithState function (module-level so the eviction
    branch is unit-testable with a fake GroupState)."""

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        rt = _runtime(config)
        (conv_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle eviction: emit the closing totals, drop the state row
            n_turns, n_triples, max_turn = state.get
            state.remove()
            yield pd.DataFrame([(conv_id, n_turns, n_triples, max_turn)],
                               columns=["conv_id", "n_turns", "n_triples",
                                        "max_turn_idx"])
            return
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
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame([(conv_id, n_turns, n_triples, max_turn)],
                           columns=["conv_id", "n_turns", "n_triples",
                                    "max_turn_idx"])

    return fn


def conversation_state_counts(src: DataFrame, config: KGConfig,
                              idle_timeout_ms: int | None = None
                              ) -> DataFrame:
    """stream/batch of turns -> running per-conversation totals.

    ``idle_timeout_ms``: processing-time idle budget after which a
    conversation's state is evicted (its final totals are emitted once
    more as a closing record) — use with CONTINUOUS triggers; a bounded
    ``availableNow`` drain never fires processing-time timeouts (and
    blocking on processAllAvailable with pending timeouts does not
    terminate), which is why the deterministic parity harness runs
    without a timeout."""
    return (src.select("conv_id", "turn_idx", "text")
              # boundary guard: a null turn_idx (possible in any
              # user-supplied frame) reaches the worker as NaN and
              # int(NaN) raises — in a stream that permanently fails
              # the query on the same replayed micro-batch
              .filter("turn_idx IS NOT NULL")
            .groupBy("conv_id")
            .applyInPandasWithState(
                make_state_fn(config, idle_timeout_ms),
                OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms is not None
                else GroupStateTimeout.NoTimeout))


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
