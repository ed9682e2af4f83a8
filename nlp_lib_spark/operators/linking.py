"""Entity linking: broadcast dictionary join + n-gram Jaccard scoring.

North-rule stage (SURVEY.md §2.9). Matching semantics extend the
reference's gazetteer (lowercase, exact membership) with a fuzzy tier:

1. exact tier — normalize(mention) equi-joined against the broadcast
   dictionary (never shuffle the dictionary);
2. fuzzy tier — unmatched mentions explode into character 3-grams, join a
   3-gram inverted index of the dictionary (blocking), then score
   Jaccard = |inter| / (|A| + |B| - |inter|) and keep the best candidate
   above ``threshold`` (deterministic tiebreak: higher score, then
   lexicographically smaller entity).

Everything is built-in DataFrame ops — the n-gram generation is a JVM-side
``transform(sequence(...))`` expression, not a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_NORM = "trim(regexp_replace(lower(%s), '\\\\s+', ' '))"


def _grams_expr(col: str) -> str:
    # character 3-grams of the normalized string (padded variant unneeded:
    # mentions are >= 1 char; short strings fall back to the whole string)
    return (f"CASE WHEN length({col}) < 3 THEN array({col}) ELSE "
            f"array_distinct(transform(sequence(1, length({col}) - 2), "
            f"i -> substring({col}, i, 3))) END")


def normalize_mentions(mentions: DataFrame,
                       text_col: str = "mention_text") -> DataFrame:
    return mentions.withColumn("norm", F.expr(_NORM % text_col))


def link_mentions(mentions: DataFrame, dictionary: DataFrame,
                  threshold: float = 0.5) -> DataFrame:
    """mentions(..., mention_text) x dictionary(entity) -> +entity, method, score.

    ``dictionary`` has one column ``entity`` (canonical surface form).
    """
    # the mention frame is consumed by three+ plans (exact join, the
    # isEmpty probe, the anti-join, gram explode); localCheckpoint so an
    # expensive upstream (the Arrow annotation chain) runs exactly once
    m = normalize_mentions(mentions).localCheckpoint()
    d = (dictionary
         .withColumn("entity_norm", F.expr(_NORM % "entity"))
         .select("entity", "entity_norm").distinct())

    exact = (m.join(F.broadcast(d), m.norm == d.entity_norm)
             .withColumn("method", F.lit("exact"))
             .withColumn("score", F.lit(1.0))
             .drop("entity_norm"))

    unmatched = m.join(F.broadcast(d),
                       m.norm == d.entity_norm, "left_anti")
    # no isEmpty() short-circuit: the probe costs a full job every call;
    # when nothing is unmatched the fuzzy branch plans are near-free
    mg = unmatched.withColumn("grams", F.expr(_grams_expr("norm"))) \
                  .withColumn("n_a", F.size("grams"))
    dg = (d.withColumn("grams", F.expr(_grams_expr("entity_norm")))
          .withColumn("n_b", F.size("grams"))
          .select("entity", "entity_norm", "n_b",
                  F.explode("grams").alias("gram")))
    cand = (mg.select("norm", "n_a", F.explode("grams").alias("gram"))
            .distinct()
            .join(F.broadcast(dg), "gram")
            .groupBy("norm", "n_a", "entity", "n_b")
            .agg(F.count(F.lit(1)).alias("inter"))
            .withColumn("score", F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4))
            .filter(F.col("score") >= threshold))
    w = Window.partitionBy("norm").orderBy(F.desc("score"), F.asc("entity"))
    best = (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("norm", "entity", "score"))
    fuzzy = (unmatched.join(best, "norm", "inner")
             .withColumn("method", F.lit("jaccard3")))
    missing = (unmatched.join(best, "norm", "left_anti")
               .withColumn("entity", F.col("norm"))
               .withColumn("score", F.lit(0.0))
               .withColumn("method", F.lit("unlinked")))
    cols = exact.columns
    return exact.select(cols).union(fuzzy.select(cols)).union(missing.select(cols))


def link_edges_for_cc(linked: DataFrame) -> DataFrame:
    """Similarity edges (norm <-> entity) feeding connected components."""
    return (linked.filter(F.col("method") != "unlinked")
            .select(F.col("norm").alias("u"), F.col("entity").alias("v"))
            .distinct())
