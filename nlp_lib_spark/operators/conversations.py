"""Conversation assembly: turns -> ordered conversations.

North-star stage: "turns are assembled into conversations with a window
over (conv_id, turn_idx) preserving stable turn ordering". Two shapes:

* ``assemble_conversations`` — groupBy(conv_id) with an order-stable
  aggregation (collect + array_sort on the struct key); no window needed,
  one shuffle on conv_id. The sort key is (turn_idx) alone — dense and
  unique per conversation by contract, so ordering is total and stable
  under any task/partition schedule (north-rule invariant).
* ``with_turn_order`` — windowed row_number/lag per turn for
  sessionization-style consumers (gap detection between ts values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assemble_conversations(turns: DataFrame) -> DataFrame:
    """-> (conv_id, n_turns, first_role, conversation_text)."""
    return (turns
            .groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.array_sort(
                     F.collect_list(F.struct("turn_idx", "role", "text"))
                 ).alias("ts_"))
            .select("conv_id", "n_turns",
                    F.col("ts_")[0]["role"].alias("first_role"),
                    F.concat_ws(
                        " | ",
                        F.transform(F.col("ts_"), lambda x: x["text"])
                    ).alias("conversation_text")))


def with_turn_order(turns: DataFrame) -> DataFrame:
    """Adds rn (dense per conv) and gap to previous turn's ts (seconds)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (turns
            .withColumn("rn", F.row_number().over(w))
            .withColumn("prev_ts", F.lag("ts").over(w))
            .withColumn("gap_sec",
                        F.when(F.col("prev_ts").isNull(), F.lit(None))
                         .otherwise(F.col("ts").cast("long")
                                    - F.col("prev_ts").cast("long")))
            .drop("prev_ts"))
