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

# Max distinct entity norms for which driver-side IDF computation (and the
# dictionary broadcast generally) is considered sound. ~1M norms of ~30
# chars is tens of MB collected — comfortably driver-sized; beyond that,
# use a distributed IDF (see the error message in link_mentions_tfidf).
MAX_DICT_ENTITIES = 1_000_000


def _grams_expr(col: str) -> str:
    # character 3-grams of the normalized string (padded variant unneeded:
    # mentions are >= 1 char; short strings fall back to the whole string)
    return (f"CASE WHEN length({col}) < 3 THEN array({col}) ELSE "
            f"array_distinct(transform(sequence(1, length({col}) - 2), "
            f"i -> substring({col}, i, 3))) END")


def normalize_mentions(mentions: DataFrame,
                       text_col: str = "mention_text") -> DataFrame:
    return mentions.withColumn("norm", F.expr(_NORM % text_col))


def _canonical_dictionary(dictionary: DataFrame) -> DataFrame:
    """One entity per NORMALIZED surface form, min-entity tiebreak.

    Two raw dictionary entries that normalize identically (e.g. 'US' /
    'us') would otherwise both join in the exact tier and emit duplicate
    verdicts for one mention norm — violating the one-verdict-per-norm
    contract the fuzzy tier enforces with its row_number tiebreak."""
    return (dictionary
            .withColumn("entity_norm", F.expr(_NORM % "entity"))
            .groupBy("entity_norm")
            .agg(F.min("entity").alias("entity"))
            .select("entity", "entity_norm"))


def link_mentions(mentions: DataFrame, dictionary: DataFrame,
                  threshold: float = 0.5) -> DataFrame:
    """mentions(..., mention_text) x dictionary(entity) -> +entity, method, score.

    ``dictionary`` has one column ``entity`` (canonical surface form).
    """
    # the mention frame is consumed by three+ plans (exact join, the
    # isEmpty probe, the anti-join, gram explode); localCheckpoint so an
    # expensive upstream (the Arrow annotation chain) runs exactly once
    m = normalize_mentions(mentions).localCheckpoint()
    d = _canonical_dictionary(dictionary)

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


def _py_grams(s: str) -> list[str]:
    """Python mirror of ``_grams_expr`` (len<3 -> whole string, else
    first-occurrence-distinct character 3-grams)."""
    if len(s) < 3:
        return [s]
    seen: list[str] = []
    have = set()
    for i in range(len(s) - 2):
        g = s[i:i + 3]
        if g not in have:
            have.add(g)
            seen.append(g)
    return seen


def gram_idf_weights(entity_norms: tuple[str, ...],
                     scale: int = 1_000_000) -> tuple[dict[str, int], int]:
    """Integer IDF weight per dictionary 3-gram, plus the OOV weight.

    ``w(g) = max(1, round(scale * ln((N+1)/df(g))))`` over the N distinct
    dictionary entities; a mention gram absent from every entity gets the
    smoothed ``df=0.5`` weight.  Weights are computed ONCE driver-side
    (the dictionary is a broadcast-size dimension by the same contract
    that lets it broadcast-join) and injected as integer literals into
    both the Spark plan and the DuckDB oracle — so no ``ln`` ever
    executes inside either engine and the score arithmetic stays
    engine-exact (integer sums + one BIGINT floor division; the pr_eval
    lesson)."""
    import math
    norms = sorted(set(entity_norms))
    n = len(norms)
    df: dict[str, int] = {}
    for e in norms:
        for g in set(_py_grams(e)):
            df[g] = df.get(g, 0) + 1
    weights = {g: max(1, int(round(scale * math.log((n + 1) / d))))
               for g, d in df.items()}
    w_oov = int(round(scale * math.log((n + 1) / 0.5)))
    return weights, w_oov


def link_mentions_tfidf(mentions: DataFrame, dictionary: DataFrame,
                        threshold_micro: int = 250_000) -> DataFrame:
    """TF-IDF-weighted fuzzy linking tier (north-star: "broadcast-joined
    candidate dictionaries with TF-IDF/Jaccard scoring").

    Same exact-tier + 3-gram blocking as :func:`link_mentions`, but the
    fuzzy score weights every gram by its dictionary IDF, so rare
    discriminative grams dominate and ubiquitous ones ("the", "ion")
    barely count:

        score = W(A ∩ B) / (W(A) + W(B) - W(A ∩ B))

    with ``W`` the integer IDF-weight sum (mention grams are a set, so
    tf=1 — weighted Jaccard over the gram sets).  ``score_micro`` is the
    exact BIGINT floor of ``10^6 * score`` — integer end-to-end, so the
    DuckDB oracle hashes bit-identically.  Output: one verdict per
    distinct normalized mention ``(norm, entity, method, score_micro)``
    with method ∈ {exact, tfidf3, unlinked}.

    Scale shape: the dictionary (and thus the gram-weight table) is
    broadcast; the mention side never shuffles except the one
    groupBy(norm, entity) over gram-blocked candidates — identical to
    the Jaccard tier's plan."""
    spark = mentions.sparkSession
    m = normalize_mentions(mentions).select("norm").distinct() \
        .localCheckpoint()
    d = _canonical_dictionary(dictionary)
    # ENFORCED broadcast-size contract: IDF weights are computed
    # driver-side from the collected dictionary, which is only sound
    # while the dictionary is a broadcast-size dimension. limit(N+1)
    # bounds the collect itself, so an oversized dictionary fails fast
    # here instead of silently OOMing the driver.
    probe = d.select("entity_norm").distinct() \
             .limit(MAX_DICT_ENTITIES + 1).collect()
    if len(probe) > MAX_DICT_ENTITIES:
        raise ValueError(
            f"link_mentions_tfidf: dictionary exceeds the broadcast-size "
            f"contract ({MAX_DICT_ENTITIES} distinct entity norms). Use "
            f"link_mentions_tfidf_distributed, which computes gram IDF "
            f"with a distributed aggregation and joins the weights frame "
            f"instead of injecting driver-side literals.")
    ents = tuple(r.entity_norm for r in probe)
    weights, w_oov = gram_idf_weights(ents)
    wdf = spark.createDataFrame(sorted(weights.items()),
                                "gram string, w long")

    exact = (m.join(F.broadcast(d), m.norm == d.entity_norm)
             .select("norm", "entity",
                     F.lit("exact").alias("method"),
                     F.lit(1_000_000).cast("long").alias("score_micro")))
    unmatched = m.join(F.broadcast(d), m.norm == d.entity_norm,
                       "left_anti")

    mg = (unmatched.withColumn("grams", F.expr(_grams_expr("norm")))
          .select("norm", F.explode("grams").alias("gram")))
    a_w = (mg.join(F.broadcast(wdf), "gram", "left")
           .groupBy("norm")
           .agg(F.sum(F.coalesce(F.col("w"), F.lit(w_oov)))
                .alias("a_w")))
    dg = (d.withColumn("grams", F.expr(_grams_expr("entity_norm")))
          .select("entity", F.explode("grams").alias("gram"))
          .join(wdf, "gram"))
    b_w = dg.groupBy("entity").agg(F.sum("w").alias("b_w"))
    inter = (mg.join(F.broadcast(dg), "gram")
             .groupBy("norm", "entity")
             .agg(F.sum("w").alias("inter_w")))
    cand = (inter.join(a_w, "norm").join(F.broadcast(b_w), "entity")
            .withColumn("score_micro", F.expr(
                "(inter_w * 1000000L) DIV (a_w + b_w - inter_w)"))
            .filter(F.col("score_micro") >= threshold_micro))
    w = Window.partitionBy("norm").orderBy(F.desc("score_micro"),
                                           F.asc("entity"))
    best = (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("norm", "entity", "score_micro"))
    fuzzy = (unmatched.join(best, "norm")
             .select("norm", "entity",
                     F.lit("tfidf3").alias("method"), "score_micro"))
    missing = (unmatched.join(best, "norm", "left_anti")
               .select("norm", F.col("norm").alias("entity"),
                       F.lit("unlinked").alias("method"),
                       F.lit(0).cast("long").alias("score_micro")))
    return exact.unionByName(fuzzy).unionByName(missing)


def link_mentions_tfidf_distributed(mentions: DataFrame,
                                    dictionary: DataFrame,
                                    threshold_micro: int = 250_000,
                                    max_gram_df_frac: float | None = None
                                    ) -> DataFrame:
    """The beyond-broadcast-size TF-IDF linking tier: same verdict schema
    and (by default) same scores as :func:`link_mentions_tfidf`, with NO
    driver-side dictionary collect and NO dictionary broadcast — the
    scale path the broadcast variant's contract error names.

    How each broadcast-variant driver/broadcast structure becomes
    distributed:

    * IDF weights: ``explode(grams) -> groupBy(gram).count()`` over the
      canonicalized dictionary (grams are per-entity-distinct already via
      ``array_distinct``), then ``w = greatest(1, bround(scale *
      ln((N+1)/df)))`` computed JVM-side. ``bround`` is half-even —
      Python's ``round`` — so weights match :func:`gram_idf_weights`
      bit-for-bit (same IEEE doubles in, same rounding). Only the scalar
      entity count N (one aggregate) reaches the driver.
    * exact tier + anti-join: plain shuffle equi-joins on the norm key.
    * candidate blocking: mention grams shuffle-join dictionary grams on
      the gram key (both sides already hash-partitioned by gram from the
      weight join, so AQE coalesces rather than re-shuffles).

    Skew: a ubiquitous gram ("ion", " th") fans the blocking join out as
    |mentions with g| x |entities with g|. AQE's skew-join split handles
    moderate cases; for web-scale dictionaries pass ``max_gram_df_frac``
    (e.g. 0.01) to drop grams present in more than that fraction of
    entities from the score's gram universe entirely (consistently from
    BOTH sides and from the OOV fallback, so the score stays a true
    weighted Jaccard over the reduced universe — stop-gram removal, the
    documented approximation; such grams carry near-zero IDF weight
    anyway). Default None = exact broadcast-variant semantics."""
    # d feeds FOUR consumers (the count, dg, the exact join, the
    # anti-join) — same multi-consumer re-computation hazard as dg/wdf/m
    # below, so the canonicalization shuffle materializes once too.
    d = _canonical_dictionary(dictionary).localCheckpoint()
    n = d.count()  # scalar aggregate — the only driver round-trip
    import math
    scale = 1_000_000
    w_oov = int(round(scale * math.log((n + 1) / 0.5)))
    # floor at 1: for small dictionaries frac*n < 1 would floor to a cap
    # of 0 and silently drop EVERY gram (all fuzzy mentions unlinked);
    # the cap's intent is to drop only ubiquitous grams, so the smallest
    # meaningful cap is "grams in exactly one entity".
    df_cap = (max(1, int(max_gram_df_frac * n))
              if max_gram_df_frac is not None else n)

    # dg feeds three consumers (the weight aggregation, the in-dict
    # probe, the weighted index) and wdf two — Spark SQL re-computes a
    # referenced subtree per consumer (no common-subplan sharing), which
    # for a data-sized dictionary means re-exploding and re-aggregating
    # it up to three times. localCheckpoint materializes each ONCE to
    # executor-local storage (the same pattern as the mention frame).
    dg = (d.withColumn("grams", F.expr(_grams_expr("entity_norm")))
          .select("entity", F.explode("grams").alias("gram"))
          .localCheckpoint())
    wdf = (dg.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") <= F.lit(df_cap))
           .withColumn("w", F.greatest(
               F.lit(1).cast("long"),
               F.bround(F.lit(float(scale)) *
                        F.log((F.lit(n) + F.lit(1.0)) / F.col("df")))
               .cast("long")))
           .select("gram", "w")
           .localCheckpoint())

    m = normalize_mentions(mentions).select("norm").distinct() \
        .localCheckpoint()
    exact = (m.join(d, m.norm == d.entity_norm)
             .select("norm", "entity",
                     F.lit("exact").alias("method"),
                     F.lit(1_000_000).cast("long").alias("score_micro")))
    unmatched = m.join(d, m.norm == d.entity_norm, "left_anti")

    mg_all = (unmatched.withColumn("grams", F.expr(_grams_expr("norm")))
              .select("norm", F.explode("grams").alias("gram")))
    # per-gram weight for the mention side: capped-out grams must be
    # EXCLUDED (not OOV-weighted), so the hot-gram prune joins dg back —
    # a gram is OOV only if NO dictionary entity contains it at all
    # mg feeds TWO consumers (a_w and inter) — materialize once, like dg
    mg = (mg_all.join(wdf, "gram", "left")
          .join(dg.select("gram").distinct()
                  .withColumn("__in_dict", F.lit(True)),
                "gram", "left")
          .filter(F.col("w").isNotNull() | F.col("__in_dict").isNull())
          .withColumn("w", F.coalesce(F.col("w"), F.lit(w_oov)))
          .localCheckpoint())
    a_w = mg.groupBy("norm").agg(F.sum("w").alias("a_w"))
    dgw = dg.join(wdf, "gram")
    b_w = dgw.groupBy("entity").agg(F.sum("w").alias("b_w"))
    inter = (mg.select("norm", "gram").join(dgw, "gram")
             .groupBy("norm", "entity").agg(F.sum("w").alias("inter_w")))
    cand = (inter.join(a_w, "norm").join(b_w, "entity")
            .withColumn("score_micro", F.expr(
                "(inter_w * 1000000L) DIV (a_w + b_w - inter_w)"))
            .filter(F.col("score_micro") >= threshold_micro))
    w = Window.partitionBy("norm").orderBy(F.desc("score_micro"),
                                           F.asc("entity"))
    best = (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("norm", F.col("entity").alias("best_entity"),
                    F.col("score_micro").alias("best_score")))
    # ONE left join resolves fuzzy hits and unlinked rows together — the
    # inner-join + anti-join pair the broadcast variant uses would inline
    # (re-compute) the whole candidate subtree twice, which the broadcast
    # plan can afford and this all-shuffle plan cannot
    linked = (unmatched.join(best, "norm", "left")
              .select("norm",
                      F.coalesce("best_entity", "norm").alias("entity"),
                      F.when(F.col("best_entity").isNull(), "unlinked")
                       .otherwise("tfidf3").alias("method"),
                      F.coalesce("best_score", F.lit(0).cast("long"))
                       .alias("score_micro")))
    return exact.unionByName(linked)


def link_edges_for_cc(linked: DataFrame) -> DataFrame:
    """Similarity edges (norm <-> entity) feeding connected components."""
    return (linked.filter(F.col("method") != "unlinked")
            .select(F.col("norm").alias("u"), F.col("entity").alias("v"))
            .distinct())
