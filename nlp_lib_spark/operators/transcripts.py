"""Transcripts source: the engine's primary input table.

Production shape: an Iceberg table ``(conv_id string, turn_idx int, role
string, text string, tool string, ts timestamp)``, partitioned by
``bucket(conv_id)`` so conversation assembly shuffles minimally. In this
sandbox there is no transcripts dataset, so we derive one *deterministically*
from the driver-generated ``documents`` parquet with a dialect-shared SQL
template — the same template string renders for Spark SQL and for the DuckDB
oracle, which is what makes the driver's value-hash comparison exact.

The derived turn text embeds the constructs the reference pipeline
detects/strips (entities from the gazetteer vocabulary, relation verbs,
citation brackets, parentheticals, negation, a discourse connective), one
template family per ``doc_id % 5``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nlp_lib_spark.operators.viewsql import sql_over

# split_part is 1-based in both Spark (>=3.5) and DuckDB.
_A = "split_part(text, ' ', 3)"
_B = "split_part(text, ' ', 5)"
_C = "split_part(text, ' ', 9)"
_D = "split_part(text, ' ', 12)"

_TEMPLATES = [
    f"'the ' || {_A} || ' ' || {_B} || ' interacts with the ' || {_C} || ' ' || {_D} || ' .'",
    # sentence-initial connective: Arg1 resolves to the PREVIOUS TURN
    f"'moreover , ' || {_A} || ' ' || {_B} || ' binds to ' || {_C} || ' ' || {_D} || ' [ 12 ; 3 ] .'",
    f"'interaction of ' || {_A} || ' ' || {_B} || ' with ' || {_C} || ' ' || {_D} || ' was observed .'",
    f"'the ' || {_A} || ' ' || {_B} || ' does not regulate the ' || {_C} || ' ' || {_D} || ' .'",
    # two sentences; second carries a relation too -> same-turn HOR edge
    (f"'the association between ' || {_A} || ' ' || {_B} || ' and ' || {_C} || ' ' || {_D} || "
     f"' suggests binding ( a strong one ) . however , the ' || {_A} || ' ' || {_B} || "
     f"' activates the ' || {_C} || ' ' || {_D} || ' .'"),
]


def transcripts_select_sql(docs_rel: str, dialect: str, with_ts: bool = True) -> str:
    """Render the transcripts derivation for ``spark`` or ``duckdb``."""
    text_case = "CASE CAST(doc_id % 5 AS INT) " + " ".join(
        f"WHEN {i} THEN {t}" for i, t in enumerate(_TEMPLATES)
    ) + " END"
    if dialect == "spark":
        ts_expr = "timestampadd(SECOND, CAST(doc_id AS INT), TIMESTAMP '2024-01-01 00:00:00')"
    else:
        ts_expr = "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) SECOND"
    ts_col = f",\n  {ts_expr} AS ts" if with_ts else ""
    sql = f"""
SELECT
  'conv_' || lpad(CAST(CAST(doc_id % 100 AS INT) AS STRING), 4, '0') AS conv_id,
  CAST(floor(doc_id / 100.0) AS INT) AS turn_idx,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
  {text_case} AS text,
  CASE WHEN doc_id % 3 = 2 THEN 'search' ELSE CAST(NULL AS STRING) END AS tool{ts_col}
FROM {docs_rel}
"""
    if dialect == "duckdb":
        sql = sql.replace("AS STRING", "AS VARCHAR")
    return sql


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def transcripts(spark: SparkSession, sf_dir: str, with_ts: bool = True) -> DataFrame:
    """The transcripts DataFrame for a testdata scale-factor directory.

    A single small parquet file scans as one split, which would starve
    every core but one through the whole annotation chain — so when the
    scan yields fewer splits than the cluster's parallelism we
    repartition by conv_id (hash, conversation-co-located, matching the
    production table's ``bucket(conv_id)`` layout so downstream
    conversation windows shuffle nothing extra).  On a real multi-file
    Iceberg table the scan already produces enough splits and this is a
    no-op branch."""
    df = sql_over(load_documents(spark, sf_dir),
                  transcripts_select_sql("{t}", "spark", with_ts),
                  prefix="documents")
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, "conv_id")
    return df
