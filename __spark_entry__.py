"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship KG triple extraction on sf0.001.
queries()    — one entry per implemented operator (see SURVEY.md §2 and
               nlp_lib_spark/gate.py).
oracle_sql() — DuckDB oracle per query where SQL-expressible; the
               NLP-kernel queries (gazetteer scan, rule engine) are
               pytest-oracled instead and ship rows-only here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nlp_lib_spark.gate import ORACLES, QUERIES
from nlp_lib_spark.lexicons import TESTDATA_CONFIG
from nlp_lib_spark.operators.extract import extract_triples
from nlp_lib_spark.operators.transcripts import transcripts


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: transcripts -> (subj, pred, obj) triples."""
    t = transcripts(spark, "/root/testdata/sf0.001")
    return extract_triples(t, TESTDATA_CONFIG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
