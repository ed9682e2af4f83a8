"""Deterministic (retry-safe) corpus sampling for training-mix assembly.

At cluster scale, `rand()`-based sampling is a correctness bug: a task
retry or an AQE re-plan re-draws the randomness, so two runs (or two
attempts of one run) select different rows, lineage-based recomputation
silently changes downstream results, and no oracle can replay the
selection. These operators decide membership as a pure function of
(id, salt): keep a row iff the first 60 bits of ``md5(id || ':' || salt)``
fall below ``frac * 2^60``. The decision is bit-exact across engines
(the DuckDB gate oracle replays the identical predicate), uniform in
expectation, stable under retries/repartitioning, and tunable per run
via the salt.

The reference has no sampling stage (it always consumes whole corpora —
COVERAGE.md appendix); this is part of the training-data pipeline
extension surface, alongside dedup/quality/contamination.

Scale shape: pure whole-stage-codegen predicates on the scan — zero
shuffles, zero Python; stratified sampling adds only a CASE dispatch on
an existing column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_BITS = 60


def _sample_key_sql(id_col: str, salt: str) -> str:
    """Spark SQL expression for the 60-bit decision integer."""
    return ("CAST(conv(substring(md5(concat(CAST(" + id_col +
            f" AS STRING), ':{salt}')), 1, 15), 16, 10) AS BIGINT)")


def _threshold(frac: float) -> int:
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"sampling fraction out of [0,1]: {frac}")
    return int(frac * (1 << _HASH_BITS))


def sample_flags(df: DataFrame, fracs: dict[str, float],
                 strata_col: str, id_col: str = "doc_id",
                 salt: str = "s0",
                 default_frac: float = 0.0) -> DataFrame:
    """One row per input row: ``sample_key`` (the 60-bit decision
    integer) and ``sampled`` 0/1 under per-stratum fractions.

    Keeping the flags (rather than only the filtered subset) makes the
    selection itself auditable — the gate value-hashes every decision,
    and downstream stages can invert the sample (held-out split) from
    the same column.
    """
    key = _sample_key_sql(id_col, salt)
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {key} < {_threshold(v)}"
        for k, v in fracs.items())
    pred = f"CASE {cases} ELSE {key} < {_threshold(default_frac)} END"
    return df.select(
        "*", F.expr(key).alias("sample_key"),
        F.expr(pred).cast("int").alias("sampled"))


def stratified_sample(df: DataFrame, fracs: dict[str, float],
                      strata_col: str, id_col: str = "doc_id",
                      salt: str = "s0",
                      default_frac: float = 0.0) -> DataFrame:
    """The filtered view of :func:`sample_flags` — the rows a training
    mix keeps, e.g. ``fracs={'en': 0.3, 'de': 1.0}`` to downsample the
    dominant language while keeping all of a rare one."""
    return (sample_flags(df, fracs, strata_col, id_col, salt,
                         default_frac)
            .filter(F.col("sampled") == 1)
            .drop("sampled"))


def deterministic_sample(df: DataFrame, frac: float,
                         id_col: str = "doc_id",
                         salt: str = "s0") -> DataFrame:
    """Unstratified hash-threshold sample: keep ``frac`` of rows,
    decided per row by (id, salt) alone."""
    key = _sample_key_sql(id_col, salt)
    return df.filter(F.expr(f"{key} < {_threshold(frac)}"))
