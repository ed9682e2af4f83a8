"""Table catalog: Iceberg in production, parquet fallback in this sandbox.

The engine's contract tables (``transcripts``, ``annotations``, ``triples``,
``nodes``, ``edges``) are Iceberg tables partitioned by ``bucket(N,
conv_id)`` / ``bucket(N, subj_id)`` in production so conversation windows
and graph reads co-locate. The Iceberg runtime jars are not in this image
(see the PySpark guide), so the writer probes for the ``iceberg`` data
source and falls back to bucketed parquet with identical layout semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j resolves attribute chains lazily (a missing class yields a
        # JavaPackage, not an error) — Class.forName actually probes.
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path: str, bucket_col: str,
                n_buckets: int = 64, mode: str = "overwrite") -> str:
    """Write a contract table; returns the format used."""
    spark = df.sparkSession
    if iceberg_available(spark):
        (df.writeTo(path)
           .partitionedBy(F.bucket(n_buckets, bucket_col))
           .createOrReplace())
        return "iceberg"
    (df.repartition(n_buckets, bucket_col)
       .write.mode(mode).parquet(path))
    return "parquet"


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if iceberg_available(spark):
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:
            pass
    return spark.read.parquet(path)
