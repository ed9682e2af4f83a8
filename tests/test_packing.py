"""Sequence packing: contiguous greedy fill semantics, shard isolation,
retry-stability, bounds."""

import pytest


def test_pack_contiguous_fill_semantics(spark):
    from nlp_lib_spark.operators.packing import pack_sequences
    # single shard (n_shards=1), budget 10: token counts 4,4,4 -> cum
    # 4,8,12 -> first-token offsets 0,4,8 -> packs 0,0,0; the 4th doc
    # (cum 16, offset 12) starts pack 1
    docs = [(i, " ".join(["w"] * 4)) for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in
           pack_sequences(df, budget_tokens=10, n_shards=1).collect()}
    assert [out[i].pack_id for i in range(4)] == [0, 0, 0, 1]
    assert [out[i].cum_tokens for i in range(4)] == [4, 8, 12, 16]
    # an over-budget doc owns its start bin and pushes the next doc on
    big = spark.createDataFrame(
        [(0, " ".join(["w"] * 25)), (1, "w w")], "doc_id long, text string")
    o2 = {r.doc_id: r for r in
          pack_sequences(big, budget_tokens=10, n_shards=1).collect()}
    assert o2[0].pack_id == 0 and o2[1].pack_id == 2   # starts at offset 25


def test_pack_shards_are_independent(spark):
    from nlp_lib_spark.operators.packing import pack_sequences
    docs = [(i, " ".join(["w"] * 7)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pack_sequences(df, budget_tokens=21, n_shards=4).collect()
    by_shard = {}
    for r in out:
        assert r.shard == r.doc_id % 4
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        # within a shard: 3 docs of 7 tokens per 21-token pack
        assert [r.pack_id for r in rows] == [k // 3 for k in range(10)]


def test_pack_stable_under_repartition(spark):
    from nlp_lib_spark.operators.packing import pack_sequences
    docs = [(i, " ".join(["tok"] * (1 + i % 9))) for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {(r.doc_id, r.pack_id)
         for r in pack_sequences(df, 64, n_shards=8).collect()}
    b = {(r.doc_id, r.pack_id)
         for r in pack_sequences(df.repartition(17), 64,
                                 n_shards=8).collect()}
    assert a == b


def test_pack_bounds_raise(spark):
    from nlp_lib_spark.operators.packing import pack_sequences
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
    with pytest.raises(ValueError):
        pack_sequences(df, 128, n_shards=0)


def test_pack_counts_seam_equals_pack_sequences(spark):
    """pack_sequences == pack_counts over its own whitespace counts (the
    caller-supplied-counter seam must not change the default layout)."""
    from pyspark.sql import functions as F
    from nlp_lib_spark.operators.packing import pack_counts, pack_sequences
    docs = [(i, " ".join(["tok"] * (1 + i % 9))) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(tuple(r) for r in pack_sequences(df, 64, n_shards=4).collect())
    counts = df.select("doc_id", F.expr("size(split(text, ' '))")
                       .cast("long").alias("n_tokens"))
    b = sorted(tuple(r) for r in pack_counts(counts, 64, n_shards=4).collect())
    assert a == b


def test_pack_counts_custom_counter(spark):
    """Packing by an arbitrary counter column: cumulative sums and bin
    ids follow the supplied counts, id-ordered within each shard."""
    from nlp_lib_spark.operators.packing import pack_counts
    counts = spark.createDataFrame(
        [(0, 10), (2, 20), (4, 30), (6, 500), (8, 5)],
        "doc_id long, n_bpe long")
    got = {r.doc_id: (r.shard, r.cum_tokens, r.pack_id)
           for r in pack_counts(counts, 64, n_shards=2,
                                count_col="n_bpe").collect()}
    # all even ids -> shard 0; cumsum 10,30,60,560,565; first-token bins
    assert got == {0: (0, 10, 0), 2: (0, 30, 0), 4: (0, 60, 0),
                   6: (0, 560, 0), 8: (0, 565, 8)}
