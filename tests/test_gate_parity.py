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
