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


def assemble_conversations(turns: DataFrame,
                           max_turns: int | None = None) -> DataFrame:
    """-> (conv_id, n_turns, first_role, conversation_text).

    ``max_turns`` is the skew safety valve for adversarial corpora: one
    hot conv_id with millions of turns would otherwise materialize the
    full struct list in a single aggregation buffer (the OOM shape
    ``skew.capped_collect`` exists for). When set, a ``row_number``
    window keeps the ``max_turns`` LOWEST turn_idx rows per conversation
    BEFORE the collect (``n_turns`` still counts every turn, so the
    truncation is observable as ``n_turns > max_turns``). Default None =
    assemble everything — complete assembly is the semantic contract,
    so truncation must be an explicit caller decision."""
    n_all = F.count(F.lit(1))
    if max_turns is not None:
        wk = Window.partitionBy("conv_id")
        turns = (turns
                 .withColumn("__n_all", F.count(F.lit(1)).over(wk))
                 .withColumn("__rn", F.row_number().over(
                     wk.orderBy("turn_idx")))
                 .filter(F.col("__rn") <= max_turns))
        n_all = F.first("__n_all")
    return (turns
            .groupBy("conv_id")
            .agg(n_all.alias("n_turns"),
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
            .withColumn("gap_sec",  # NULL prev_ts propagates to NULL gap
                        F.col("ts").cast("long")
                        - F.col("prev_ts").cast("long"))
            .drop("prev_ts"))


def boilerplate_scrub(sentences: DataFrame,
                      max_convs: int = 2,
                      hot_threshold: int | None = 10_000) -> DataFrame:
    """Cross-conversation boilerplate removal: sentences appearing in
    more than ``max_convs`` distinct conversations are template noise
    (greeting lines, legal footers) and are dropped; the rest of each
    conversation survives in original (turn_idx, sent_id) order.

    -> (conv_id, n_sents, n_removed, kept_md5) where kept_md5 hashes the
    newline-joined retained sentences, so a value match certifies the
    exact retained text and ordering, not just counts.

    Shuffle shape: one (sentence)-keyed count with map-side partial
    combine, a join back on sentence, and one conv_id aggregation. The
    collect_list buffer is bounded by conversation length — the same
    bound assemble_conversations already accepts.

    The join back is the skew point: by definition the sentences this
    operator targets are the HOT keys (one legal footer in half of all
    conversations), and AQE's byte-based skew detection is blind to
    exactly that shape — a hot partition of near-identical rows
    compresses away in MapOutputStatistics while the task still
    processes every decompressed row (measured round 5: 500k-copy hot
    key, every AQEShuffleRead merely 'coalesced' even at a 100 KB
    threshold / factor 2). So the operator splits the key space itself:
    sentences seen in >= ``hot_threshold`` distinct conversations (at
    most total_convs/hot_threshold of them, so the set always
    broadcasts) take a broadcast join at scan speed — their rows never
    enter the sentence shuffle — and the remainder takes the shuffle
    join with per-key fan-out bounded by ``hot_threshold``. Pass
    ``hot_threshold=None`` for the plain single-join plan. Output is
    value-identical either way (gate kg_boilerplate certifies both
    counts and the retained-text md5)."""
    counts = (sentences.groupBy("sentence")
              .agg(F.countDistinct("conv_id").alias("__nc")))
    if hot_threshold is None:
        j = sentences.join(counts, "sentence")
    else:
        hot = counts.filter(F.col("__nc") >= hot_threshold)
        cold = counts.filter(F.col("__nc") < hot_threshold)
        # hot rows resolve via broadcast at the scan (no shuffle);
        # the broadcast anti-join keeps them out of the shuffle entirely
        j = (sentences.join(F.broadcast(hot), "sentence")
             .unionByName(
                 sentences.join(F.broadcast(hot.select("sentence")),
                                "sentence", "left_anti")
                 .join(cold, "sentence")))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.when(
            F.col("__nc") <= max_convs,
            F.struct("turn_idx", "sent_id", "sentence")))),
        lambda s: s["sentence"])
    return (j.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_sents"),
                 F.count(F.when(F.col("__nc") > max_convs, 1))
                  .alias("n_removed"),
                 F.md5(F.concat_ws("\n", ordered).cast("binary"))
                  .alias("kept_md5"))
            .select("conv_id", "n_sents", "n_removed", "kept_md5"))
