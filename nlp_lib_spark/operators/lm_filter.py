"""CCNet-style n-gram language-model perplexity filter, integer-exact.

Production LLM-data pipelines (CCNet, the filtering stage behind LLaMA's
CommonCrawl slice; Gopher/MassiveText's "documents unlike the target
distribution" screen) score every document with a small language model
trained on a trusted reference corpus and keep/bucket documents by
perplexity — the classic head/middle/tail terciles.  This module is that
operator re-expressed Spark-first with one deliberate twist: the score is
the **Shannon code length in whole bits** of each bigram under the
Laplace-smoothed reference model,

    cost(w1, w2) = bitlen(c1(w1) + V) - bitlen(c(w1, w2) + 1)

where ``bitlen(x) = floor(log2 x) + 1`` is the length of ``x``'s binary
representation, ``c`` / ``c1`` are bigram / left-unigram counts on the
reference slice and ``V`` the reference vocabulary size.  ``bitlen`` of a
BIGINT is exact integer arithmetic in both engines (Spark
``length(conv(x, 10, 2))``, DuckDB ``length(format('{:b}', x))``), so the
whole scorer is bit-identical across Spark, DuckDB, retries and
re-partitioning — no float ``ln`` whose last ulp could flip a rounded
weight (the repo-wide kg_ml_triples convention).  The integer cost is a
true code length: it brackets the real negative log2-probability within
one bit per token, which preserves exactly the ordering information the
tercile bucketing consumes.

Reference-model slice: ``doc_id % train_mod == 0`` — a deterministic
stand-in for "the Wikipedia LM" of CCNet; at production scale the slice
would be a curated table, and the operator takes it as a parameter.

Per document the operator emits total bits, bigram count, milli-bits per
bigram (integer division; -1 for documents with fewer than two tokens)
and the CCNet bucket ``head`` / ``middle`` / ``tail`` (``na`` for
unscoreable documents).  Bucket thresholds are the tercile boundaries of
the milli-bits distribution computed from the **distinct-score histogram**
(groupBy score → cumulative sum over distinct scores), never a global
row-level window: the windowed step touches one row per distinct score
(bounded by the milli-bit resolution, thousands at any corpus size), so
there is no single-partition pass over the data itself.

Scale shape (100 TB posture):
- reference counts: explode → groupBy(w1[, w2]) with map-side partial
  aggregation; stopword-pair skew on the join keys is AQE skew-join
  territory (spark.sql.adaptive.skewJoin is on in session.get_spark).
- scoring: two LEFT equi-joins (doc bigrams × uni / bi count tables) —
  shuffle joins on the same key family, then one groupBy(doc_id).
- V and the two tercile thresholds are 1-row frames: broadcast-nested-
  loop cross joins, no driver collect in the plan.

Reference parity note: the reference library has no corpus-level LM
(it is a per-sentence annotate→extract pipeline, SURVEY §2); this
operator belongs to the training-data-pipeline layer the build brief
adds on top (dedup/quality/decontamination family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nlp_lib_spark.operators.viewsql import sql_over

#: milli-bits-per-bigram resolution of the bucket thresholds.
_MILLI = 1000


def _bitlen(x: str, dialect: str) -> str:
    """Exact integer bit length of a non-negative BIGINT expression."""
    if dialect == "spark":
        return f"length(conv(CAST({x} AS STRING), 10, 2))"
    return f"length(format('{{:b}}', {x}))"


def _bigrams_cte(src: str, dialect: str, with_doc: bool) -> str:
    """Adjacent-token-pair stream over ``src`` (a CTE with doc_id, arr)."""
    doc = "doc_id, " if with_doc else ""
    if dialect == "spark":
        return (f"SELECT {doc}arr[pos] AS w1, arr[pos + 1] AS w2 "
                f"FROM {src} LATERAL VIEW explode(CASE WHEN size(arr) >= 2 "
                f"THEN sequence(0, size(arr) - 2) ELSE array() END) z AS pos")
    return (f"SELECT {doc}arr[i] AS w1, arr[i + 1] AS w2 "
            f"FROM (SELECT doc_id, arr, "
            f"unnest(generate_series(1, len(arr) - 1)) AS i FROM {src})")


def _score_sql(dialect: str, source: str, train_mod: int) -> str:
    """Part 1 — the per-document score table (doc_id, lm_n_bigrams,
    lm_bits, lm_milli_bits).  This is the expensive subtree (explode +
    count joins); the Spark operator materializes it once via
    localCheckpoint because part 2 consumes it twice (threshold pass +
    final bucketing) and Spark inlines CTEs, which would re-run the
    whole join at 100 TB (the linking.py multi-consumer precedent)."""
    if dialect == "spark":
        split, idiv = "split(text, ' ')", "DIV"
    else:
        split, idiv = "string_split(text, ' ')", "//"
    return f"""
WITH toks AS (SELECT doc_id, {split} AS arr FROM {source}),
tr AS (SELECT doc_id, arr FROM toks WHERE doc_id % {train_mod} = 0),
vsz AS (SELECT count(DISTINCT w) AS v FROM
          (SELECT {'explode(arr) AS w FROM tr' if dialect == 'spark'
                   else 'unnest(arr) AS w FROM tr'}) u),
trb AS ({_bigrams_cte('tr', dialect, with_doc=False)}),
uni AS (SELECT w1, count(*) AS c1 FROM trb GROUP BY w1),
big AS (SELECT w1, w2, count(*) AS c FROM trb GROUP BY w1, w2),
db AS ({_bigrams_cte('toks', dialect, with_doc=True)}),
j AS (SELECT d.doc_id,
             {_bitlen('coalesce(u.c1, 0) + v.v', dialect)}
           - {_bitlen('coalesce(b.c, 0) + 1', dialect)} AS cost
      FROM db d CROSS JOIN vsz v
      LEFT JOIN uni u ON u.w1 = d.w1
      LEFT JOIN big b ON b.w1 = d.w1 AND b.w2 = d.w2),
agg AS (SELECT doc_id, CAST(sum(cost) AS BIGINT) AS lm_bits,
               count(*) AS n FROM j GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS lm_n_bigrams,
       CAST(coalesce(a.lm_bits, -1) AS BIGINT) AS lm_bits,
       CAST(CASE WHEN a.n IS NULL THEN -1
            ELSE (a.lm_bits * {_MILLI}) {idiv} a.n END
            AS BIGINT) AS lm_milli_bits
FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""


def _bucket_sql(source: str) -> str:
    """Part 2 — tercile thresholds from the distinct-score histogram of
    ``source`` (a per-document score table), then the bucket label.
    Dialect-neutral: plain ANSI over the part-1 columns."""
    return f"""
WITH sc AS (SELECT lm_milli_bits AS s, count(*) AS c FROM {source} sq
            WHERE lm_n_bigrams >= 1 GROUP BY lm_milli_bits),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM sc),
cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM sc),
th AS (SELECT min(CASE WHEN cum * 3 >= t.tot THEN s END) AS t1,
              min(CASE WHEN cum * 3 >= t.tot * 2 THEN s END) AS t2
       FROM cum CROSS JOIN tot t)
SELECT p.doc_id, p.lm_n_bigrams, p.lm_bits, p.lm_milli_bits,
       CASE WHEN p.lm_n_bigrams = 0 THEN 'na'
            WHEN p.lm_milli_bits <= h.t1 THEN 'head'
            WHEN p.lm_milli_bits <= h.t2 THEN 'middle'
            ELSE 'tail' END AS lm_bucket
FROM {source} p CROSS JOIN th h
"""


def lm_filter_sql(dialect: str, source: str, train_mod: int = 3) -> str:
    """The full scorer in either dialect — both the DuckDB oracle and
    (in two localCheckpoint-separated halves) the Spark operator render
    from these templates, so the engines agree by construction (the
    quality_feature_exprs convention)."""
    return _bucket_sql(f"({_score_sql(dialect, source, train_mod)}\n)")


def lm_filter(df: DataFrame, train_mod: int = 3) -> DataFrame:
    """Score + bucket every document of ``df`` (doc_id, text) under the
    integer code-length bigram LM trained on the ``doc_id % train_mod
    == 0`` reference slice.  One row per input document.

    The part-1 score table is localCheckpoint-materialized: part 2
    consumes it twice (thresholds + labeling), and without the cut
    Spark's CTE inlining re-runs the explode/join scoring subtree —
    the difference between one and two full passes at 100 TB.  The
    checkpoint holds 4 integers per document, negligible next to the
    corpus."""
    if train_mod < 1:
        raise ValueError(f"train_mod must be >= 1, got {train_mod}")
    per = sql_over(df, _score_sql("spark", "{t}", train_mod),
                   prefix="lmscore").localCheckpoint()
    return sql_over(per, _bucket_sql("{t}"), prefix="lmbucket")
