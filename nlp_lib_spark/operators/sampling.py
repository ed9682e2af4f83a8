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


def _sample_key(id_col: str, salt: str):
    """Column expression for the 60-bit decision integer. The salt rides
    in as a bound literal (``F.lit``), never interpolated into SQL text —
    a quote or SQL metacharacter in the salt is data, not syntax."""
    return F.conv(F.substring(F.md5(F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.lit(salt))),
        1, 15), 16, 10).cast("long")


def _threshold(frac: float) -> int:
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"sampling fraction out of [0,1]: {frac}")
    return int(frac * (1 << _HASH_BITS))


def sample_flags(df: DataFrame, fracs: dict[str, float],
                 strata_col: str, id_col: str = "doc_id",
                 salt: str = "s0",
                 default_frac: float = 1.0) -> DataFrame:
    """One row per input row: ``sample_key`` (the 60-bit decision
    integer) and ``sampled`` 0/1 under per-stratum fractions.

    Keeping the flags (rather than only the filtered subset) makes the
    selection itself auditable — the gate value-hashes every decision,
    and downstream stages can invert the sample (held-out split) from
    the same column.

    Strata absent from ``fracs`` fall through to ``default_frac``, which
    defaults to 1.0 (KEEP unknown strata): when a new language/length
    band appears in a growing corpus, silently dropping it is surprising
    data loss for a training-mix operator — pass ``default_frac=0.0``
    explicitly to make the whitelist semantics a stated decision. The
    dispatch is built from column expressions (``F.when`` over bound
    literals), so stratum keys containing quotes or SQL metacharacters
    are data, never syntax."""
    key = _sample_key(id_col, salt)
    fallback = key < F.lit(_threshold(default_frac))
    pred = None
    for k, v in fracs.items():
        cond = (F.col(strata_col) == F.lit(k), key < F.lit(_threshold(v)))
        pred = F.when(*cond) if pred is None else pred.when(*cond)
    pred = fallback if pred is None else pred.otherwise(fallback)
    return df.select(
        "*", key.alias("sample_key"),
        pred.cast("int").alias("sampled"))


def stratified_sample(df: DataFrame, fracs: dict[str, float],
                      strata_col: str, id_col: str = "doc_id",
                      salt: str = "s0",
                      default_frac: float = 1.0) -> DataFrame:
    """The filtered view of :func:`sample_flags` — the rows a training
    mix keeps, e.g. ``fracs={'en': 0.3, 'de': 1.0}`` to downsample the
    dominant language while keeping all of a rare one. Unknown strata
    are KEPT by default (see :func:`sample_flags`)."""
    return (sample_flags(df, fracs, strata_col, id_col, salt,
                         default_frac)
            .filter(F.col("sampled") == 1)
            .drop("sampled"))


def deterministic_sample(df: DataFrame, frac: float,
                         id_col: str = "doc_id",
                         salt: str = "s0") -> DataFrame:
    """Unstratified hash-threshold sample: keep ``frac`` of rows,
    decided per row by (id, salt) alone."""
    return df.filter(_sample_key(id_col, salt) < F.lit(_threshold(frac)))
