"""Replicates the driver's Spark-vs-DuckDB gate locally at sf0.001."""

from __future__ import annotations

import os

import pytest

from nlp_lib_spark.gate import ORACLES, QUERIES
from nlp_lib_spark.paritycheck import compare_query

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF_DIR),
                                reason="testdata not present")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracled_query_parity(spark, name):
    res = compare_query(spark, SF_DIR, name)
    assert res["status"] == "ok", res


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    res = compare_query(spark, SF_DIR, name)
    assert res["status"] == "rows_only" and res["spark_rows"] >= 0, res


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_deterministic_and_nonempty(spark, name):
    """Rows-only queries must be non-trivial on the gate corpus and
    byte-deterministic across runs (the driver's weaker check plus the
    determinism invariant the value-hash gives oracled queries)."""
    from nlp_lib_spark.paritycheck import frame_hash
    df1 = QUERIES[name](spark, SF_DIR).toPandas()
    df2 = QUERIES[name](spark, SF_DIR).toPandas()
    assert len(df1) > 0, f"{name} returned no rows on the gate corpus"
    assert frame_hash(df1) == frame_hash(df2)


def test_zero_vector_embedding_does_not_crash_ann(spark):
    """An all-zero embedding has undefined cosine; under Spark 4's
    default ANSI mode an unguarded division raises DIVIDE_BY_ZERO and
    kills the job (review finding). The nullif guard must instead
    exclude the degenerate vector from similarity results."""
    import pandas as pd
    from nlp_lib_spark.operators.dedup import (ann_topk_bruteforce,
                                               embedding_neardup_pairs)
    rows = [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [2.0, 4.0]),
            (3, [1.0, 0.0])]
    df = spark.createDataFrame(pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1] for r in rows]}))
    near = embedding_neardup_pairs(df, threshold=0.9, max_id=None).toPandas()
    assert set(zip(near.vec_a, near.vec_b)) == {(0, 2)}  # zero vec absent
    topk = ann_topk_bruteforce(df, k=3, query_max_id=1).toPandas()
    assert 1 not in set(topk.neighbor_id)  # undefined sim never ranks
    assert len(topk) == 2  # the two real neighbors


def test_kmeans_ivf_releases_checkpoint_blocks(spark):
    import pandas as pd
    from nlp_lib_spark.operators.canonicalize import _persistent_ids
    from nlp_lib_spark.operators.dedup import ann_topk_kmeans_ivf
    df = spark.createDataFrame(pd.DataFrame(
        {"vec_id": list(range(40)),
         "embedding": [[float(i % 5), float(i % 7), float(i % 3)]
                       for i in range(40)]}))
    sc = spark.sparkContext
    before = _persistent_ids(sc)
    out = ann_topk_kmeans_ivf(df, query_max_id=4)
    assert out.count() > 0
    leaked = _persistent_ids(sc) - before
    assert len(leaked) <= 1, leaked  # only the small materialized result
