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
