"""Sequence packing: assign documents to fixed token-budget training bins.

Every LLM training pipeline packs filtered documents into fixed-length
examples (e.g. 4096-token rows). The streaming-standard algorithm is
contiguous greedy fill: within a shard, walk the documents in a stable
total order, accumulate token counts, and start a new bin whenever the
budget is crossed. That is exactly a windowed cumulative sum, so the
whole operator is one Exchange (the shard partition) + one Window —
no Python, and bit-exact across engines (the gate oracle replays the
same integer arithmetic in DuckDB).

Scale shape: sharding is explicit (``doc_id % n_shards``) because a
GLOBAL packing order is a scale bug — one total order means one
partition holds the whole corpus. Real pipelines pack per shard/worker;
``n_shards`` sizes the window partitions (at 100 TB pick n_shards so a
shard's (id, n_tokens) pairs fit an executor — the window only carries
two longs per row). Determinism: (doc_id, n_shards, budget) fully decide
every assignment, so retries and re-runs pack identically and a held-out
engine can replay the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_sequences(df: DataFrame, budget_tokens: int,
                   n_shards: int = 8, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """-> one row per document: (id, shard, n_tokens, cum_tokens,
    pack_id) with ``pack_id`` = the bin whose window the document's
    FIRST token lands in (contiguous fill; an over-budget document
    spills into the next bin rather than being split — splitting is the
    tokenizer stage's job, after this layout decides grouping)."""
    if budget_tokens <= 0 or n_shards <= 0:
        raise ValueError(f"budget_tokens={budget_tokens} n_shards="
                         f"{n_shards} must be positive")
    from pyspark.sql import Window
    base = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.expr(f"size(split({text_col}, ' '))").cast("long")
         .alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (base
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .withColumn("pack_id",
                        F.expr(f"(cum_tokens - n_tokens) DIV "
                               f"{budget_tokens}")))
