"""Deterministic sampling: the selection must be a pure function of
(id, salt) — stable under repartitioning (the retry-safety property
rand() lacks) — and the filtered operator must agree with the flags."""

import pytest


def _docs(spark, n=400):
    from pyspark.sql import functions as F
    return (spark.range(n).withColumnRenamed("id", "doc_id")
            .withColumn("len_band",
                        F.expr("CASE WHEN doc_id % 3 = 0 THEN 'short' "
                               "ELSE 'long' END")))


def test_selection_invariant_under_partitioning(spark):
    from nlp_lib_spark.operators.sampling import stratified_sample
    fr = {"short": 0.2, "long": 0.8}
    base = _docs(spark)
    a = {r.doc_id for r in
         stratified_sample(base, fr, "len_band").collect()}
    b = {r.doc_id for r in
         stratified_sample(base.repartition(13), fr, "len_band").collect()}
    c = {r.doc_id for r in
         stratified_sample(base.coalesce(1), fr, "len_band").collect()}
    assert a == b == c and 0 < len(a) < 400


def test_flags_agree_with_filtered_operator(spark):
    from nlp_lib_spark.operators.sampling import (sample_flags,
                                                  stratified_sample)
    fr = {"short": 0.3, "long": 0.6}
    base = _docs(spark)
    flagged = {r.doc_id for r in
               sample_flags(base, fr, "len_band").collect() if r.sampled}
    kept = {r.doc_id for r in
            stratified_sample(base, fr, "len_band").collect()}
    assert flagged == kept


def test_salt_changes_selection_fraction_does_not_drift(spark):
    from nlp_lib_spark.operators.sampling import deterministic_sample
    base = _docs(spark, 2000)
    a = {r.doc_id for r in deterministic_sample(base, 0.5, salt="s0").collect()}
    b = {r.doc_id for r in deterministic_sample(base, 0.5, salt="s1").collect()}
    assert a != b                       # a new salt is a new draw
    for got in (len(a), len(b)):        # both stay near the target rate
        assert 800 < got < 1200
    # monotone: a smaller fraction with the same salt is a SUBSET (the
    # threshold predicate nests), which rand() cannot guarantee
    sub = {r.doc_id for r in deterministic_sample(base, 0.2, salt="s0").collect()}
    assert sub <= a


def test_fraction_bounds_raise(spark):
    from nlp_lib_spark.operators.sampling import deterministic_sample
    with pytest.raises(ValueError):
        deterministic_sample(_docs(spark), 1.5)
    with pytest.raises(ValueError):
        deterministic_sample(_docs(spark), -0.1)
