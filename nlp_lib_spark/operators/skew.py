"""Explicit skew-handling utilities (hot keys at 10^12-turn scale).

AQE's skew-join handles join-side imbalance; these helpers cover the two
aggregation shapes AQE does not fix:

* ``salted_agg`` — two-phase aggregation for ALGEBRAIC aggregates over a
  skewed key: phase 1 aggregates on (key, salt) so a hot key's rows spread
  over ``n_salts`` reducers, phase 2 merges the partials per key. Results
  are identical to the direct aggregation (tests prove it); use when a
  handful of keys dominate (hot entities in edge aggregation).
* ``capped_collect`` — bounded collect_list for bucket-style operators
  (LSH buckets, conversation assembly of adversarially long convs): hot
  buckets are truncated to ``cap`` elements by a deterministic order and
  flagged, instead of OOMing an executor. The cap is a safety valve sized
  far above organic bucket sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F


def salted_agg(df: DataFrame, key_cols: list[str],
               agg_exprs: dict[str, str], n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``agg_exprs``: output_name -> one of 'count', 'sum:<col>', 'min:<col>',
    'max:<col>' (algebraic aggregates that merge associatively).

    The salt hashes the ROW CONTENT (every column), never
    ``spark_partition_id()``/``monotonically_increasing_id()``: those are
    nondeterministic across task recomputation, so a stage retry after a
    shuffle-fetch failure would re-salt recomputed rows differently and
    silently double-count or drop them (the SPARK-38388 class of bug —
    only round-robin repartition gets indeterminate-stage rollback).
    Caveat: rows that are EXACT duplicates share a salt; hot keys whose
    payload columns vary (the realistic case) still spread over
    ``n_salts`` reducers.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                         F.lit(n_salts)))
    phase1 = []
    phase2 = []
    for name, spec in agg_exprs.items():
        if spec == "count":
            phase1.append(F.count(F.lit(1)).alias(f"__p_{name}"))
            phase2.append(F.sum(f"__p_{name}").alias(name))
        else:
            op, col = spec.split(":", 1)
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            phase1.append(fn(col).alias(f"__p_{name}"))
            merge = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            phase2.append(merge(f"__p_{name}").alias(name))
    part = salted.groupBy(*key_cols, "__salt").agg(*phase1)
    return part.groupBy(*key_cols).agg(*phase2)


def capped_collect(df: DataFrame, key_cols: list[str], value_col: str,
                   cap: int = 10000) -> DataFrame:
    """groupBy key -> sorted list of values truncated at ``cap`` + flag.

    The cap is enforced BEFORE ``collect_list``: a ``row_number`` window
    (spillable sort) keeps only the ``cap`` smallest values per key, so a
    hot key never materializes an unbounded aggregation buffer — the
    post-hoc ``slice`` of the naive version truncates only after the full
    list already sat in executor memory.  NULL values sort last so they
    never consume cap slots (``collect_list`` drops them, matching the
    naive version's cap-smallest-non-null semantics).  ``n_total`` comes from an
    unordered count window in the same shuffle; the groupBy reuses the
    window's hash partitioning, so the whole operator is one exchange.
    ``n_total`` counts NON-NULL values (``count(col)`` skips nulls), so
    ``truncated`` fires only when collectable values were actually
    dropped — not when null rows merely inflated the raw row count."""
    from pyspark.sql import Window
    wk = Window.partitionBy(*key_cols)
    out = (df
           .withColumn("__rn", F.row_number().over(
               wk.orderBy(F.col(value_col).asc_nulls_last())))
           .withColumn("__n", F.count(F.col(value_col)).over(wk))
           .filter(F.col("__rn") <= cap)
           .groupBy(*key_cols)
           .agg(F.sort_array(F.collect_list(value_col)).alias("values"),
                F.first("__n").alias("n_total")))
    return out.withColumn("truncated", F.col("n_total") > F.lit(cap))
