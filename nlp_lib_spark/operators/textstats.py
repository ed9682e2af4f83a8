"""Text-analysis operators: quality scoring, language ID, token counting.

Reusable ``DataFrame -> DataFrame`` transforms (the gate queries call
these over the ``documents`` view, keeping them value-hash verified
against their DuckDB oracles).  Pure Spark SQL expressions — JVM-side,
whole-stage codegen, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nlp_lib_spark.operators.viewsql import sql_over

LANG_STOPS = {
    "en": ("the", "a", "is", "of"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def _sql(df: DataFrame, sql: str) -> DataFrame:
    return sql_over(df, sql, prefix="textstats")


def doc_quality(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Length / mean-token-length / stopword-ratio quality features."""
    return _sql(df, f"""
SELECT {id_col},
       size(split({text_col}, ' ')) AS n_tokens,
       CAST(round(length(replace({text_col}, ' ', '')) * 1.0 / size(split({text_col}, ' ')), 4) AS DOUBLE) AS mean_tok_len,
       CAST(round(size(filter(split({text_col}, ' '), x -> x IN ('the', 'a'))) * 1.0
             / size(split({text_col}, ' ')), 4) AS DOUBLE) AS stop_ratio
FROM {{t}}
""")


def doc_lang_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID with an English prior on ties."""
    parts = []
    for lang, stops in LANG_STOPS.items():
        lst = ", ".join(f"'{s}'" for s in stops)
        parts.append(f"size(filter(split({text_col}, ' '), "
                     f"x -> x IN ({lst}))) AS s_{lang}")
    scores = ",\n         ".join(parts)
    return _sql(df, f"""
WITH s AS (
  SELECT {id_col},
         {scores}
  FROM {{t}}
)
SELECT {id_col}, s_en, s_de, s_es, s_fr,
       CASE WHEN s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es > s_en AND s_es >= s_fr THEN 'es'
            WHEN s_fr > s_en THEN 'fr'
            ELSE 'en' END AS lang_guess
FROM s
""")


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Whitespace, BPE-ish regex, and ceil(len/4) subword-estimate
    token counts."""
    return _sql(df, f"""
SELECT {id_col},
       size(split({text_col}, ' ')) AS n_ws_tokens,
       size(regexp_extract_all(lower({text_col}), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_bpe_tokens,
       aggregate(split({text_col}, ' '), 0L, (s, t) -> s + CAST(ceil(length(t) / 4.0) AS BIGINT)) AS n_subword_est
FROM {{t}}
""")


# ---------------------------------------------------------------- PII scrub
# Training-data pipelines scrub personally-identifying strings before any
# further processing. Patterns are deliberately restricted to the regex
# subset whose semantics are IDENTICAL in Java (Spark, codegen'd) and RE2
# (DuckDB oracle): character classes, bounded repetition, \b, \+? — no
# backreferences, no lookaround. Detection counts are taken BEFORE
# scrubbing; replacement runs most-specific-first (card -> SSN -> phone ->
# email -> IP) so overlapping digit runs cannot double-scrub.

PII_PATTERNS = (
    # (name, raw regex, replacement tag)
    ("ccn", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "<CCN>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d{1,2} \d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII detection counts + the md5 of the scrubbed text.

    Pure JVM-side SQL (regexp_extract_all / chained regexp_replace inside
    whole-stage codegen — no Python in the path), so at 100 TB this runs
    at scan speed with zero shuffles; the gate's DuckDB oracle replays
    the same patterns through RE2."""
    counts = ",\n       ".join(
        f"size(regexp_extract_all({text_col}, "
        f"'{pat.replace(chr(92), chr(92) * 2)}', 0)) AS n_{name}"
        for name, pat, _ in PII_PATTERNS)
    scrub = text_col
    for name, pat, tag in PII_PATTERNS:
        scrub = (f"regexp_replace({scrub}, "
                 f"'{pat.replace(chr(92), chr(92) * 2)}', '{tag}')")
    return _sql(df, f"""
SELECT {id_col},
       {counts},
       md5({scrub}) AS scrubbed_md5
FROM {{t}}
""")


# -------------------------------------------------- repetition / boilerplate
# Gopher-style repetition quality filters: heavily repetitive documents
# (top-word share, duplicated bigrams) are low-quality training data. All
# outputs are exact integers (numerator/denominator pairs rather than
# fractions) so the driver hash is immune to float rendering.

def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document repetition counters: total / most-frequent word count
    and total / most-frequent / duplicated bigram counts.

    Two (doc_id, token)-keyed aggregations with map-side partial combine
    and a 1:1 doc-keyed join — the per-key cardinality is bounded by
    document length, so there is no skew amplification at 100 TB; consumers
    derive the Gopher-style fractions (top_word_n / n_words etc.)."""
    return _sql(df, f"""
WITH a AS (SELECT {id_col}, split({text_col}, ' ') AS arr FROM {{t}}),
w AS (SELECT {id_col}, word FROM a LATERAL VIEW explode(arr) AS word),
wc AS (SELECT {id_col}, word, count(*) AS n FROM w GROUP BY {id_col}, word),
wt AS (SELECT {id_col}, max(n) AS rep_top_word_n, sum(n) AS rep_n_words
       FROM wc GROUP BY {id_col}),
b AS (SELECT {id_col}, bg FROM (
        SELECT {id_col},
               zip_with(slice(arr, 1, size(arr) - 1),
                        slice(arr, 2, size(arr) - 1),
                        (x, y) -> concat(x, ' ', y)) AS bgs
        FROM a) LATERAL VIEW explode(bgs) AS bg),
bc AS (SELECT {id_col}, bg, count(*) AS n FROM b GROUP BY {id_col}, bg),
bt AS (SELECT {id_col}, max(n) AS rep_top_bigram_n, sum(n) AS rep_n_bigrams,
              sum(n) - count(*) AS rep_dup_bigrams FROM bc GROUP BY {id_col})
SELECT w.{id_col},
       rep_n_words, rep_top_word_n,
       CAST(coalesce(rep_n_bigrams, 0) AS BIGINT) AS rep_n_bigrams,
       CAST(coalesce(rep_top_bigram_n, 0) AS BIGINT) AS rep_top_bigram_n,
       CAST(coalesce(rep_dup_bigrams, 0) AS BIGINT) AS rep_dup_bigrams
FROM wt w LEFT JOIN bt b ON w.{id_col} = b.{id_col}
""")


def bench_grams(docs: DataFrame, n: int = 5, every_n: int = 10,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic benchmark gram set: the word ``n``-grams of every
    ``every_n``-th document (an eval-suite stand-in) as one ``gram``
    column. Shared by the doc_contamination and doc_pipeline gates and
    the scale rehearsal — ONE derivation, so the contamination screen
    and the composed pipeline can never certify different benchmark
    sets."""
    from pyspark.sql import functions as F
    return (docs.filter(F.col(id_col) % every_n == 0)
            .select(F.explode(F.expr(f"""
                CASE WHEN size(split({text_col}, ' ')) >= {n}
                     THEN transform(
                            sequence(1, size(split({text_col}, ' ')) - {n - 1}),
                            i -> concat_ws(' ',
                                 slice(split({text_col}, ' '), i, {n})))
                     ELSE array() END""")).alias("gram")))


def contamination_hits(docs: DataFrame, bench_gram_df: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 5) -> DataFrame:
    """Benchmark-contamination screen: per document, how many of its
    distinct word ``n``-grams appear in a benchmark n-gram set.

    The benchmark side is broadcast (eval sets are tiny next to a 100 TB
    corpus); the document side streams through one explode + distinct +
    per-doc count, so the only shuffles are keyed by (doc, gram) and doc.
    Returns every input document with hit counts defaulted to 0."""
    from pyspark.sql import functions as F
    grams = (docs
             .select(id_col, F.expr(f"split({text_col}, ' ')").alias("arr"))
             .select(id_col, F.explode(F.expr(f"""
                 CASE WHEN size(arr) >= {n}
                      THEN transform(sequence(1, size(arr) - {n} + 1),
                                     i -> concat_ws(' ', slice(arr, i, {n})))
                      ELSE array() END""")).alias("gram"))
             .distinct())
    bench = bench_gram_df.select("gram").distinct()
    hits = (grams.join(F.broadcast(bench), "gram")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("cont_hits")))
    ngrams = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("cont_n_grams"))
    return (docs.select(id_col)
            .join(ngrams, id_col, "left").join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("cont_n_grams", F.lit(0)).cast("long")
                     .alias("cont_n_grams"),
                    F.coalesce("cont_hits", F.lit(0)).cast("long")
                     .alias("cont_hits")))


# ------------------------------------------------------------ full pipeline
# The operators above compose into the standard training-data filter chain
# (C4/Gopher-style): language-agnostic quality gates -> repetition filter
# -> contamination screen -> exact-dedup keeper election. Every threshold
# is an INTEGER comparison (cross-multiplied fractions), so the kept/
# dropped verdict is bit-exact across engines.

def pipeline_kept(docs: DataFrame, bench_gram_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_tokens: int = 20, min_stop: int = 1,
                  top_word_mult: int = 8) -> DataFrame:
    """Per-document verdict of the composed filter pipeline.

    -> (doc_id, pass_quality, pass_repetition, pass_contamination,
    is_keeper, kept) — each flag an INT 0/1; ``kept`` is their AND.
    pass_quality: >= ``min_tokens`` whitespace tokens AND >= ``min_stop``
    stopwords. pass_repetition: most frequent word strictly under
    1/``top_word_mult`` of all words (integer cross-multiply).
    pass_contamination: zero benchmark n-gram hits. is_keeper: the
    minimum doc_id of this exact text (duplicates lose).

    Scale shape: the quality flags ride the scan; repetition adds its two
    bounded-key aggregations; contamination broadcasts the benchmark;
    keeper election is one (text-hash)-keyed min. All joins are 1:1 on
    doc_id, so the pipeline's cost is the sum of its stages — no stage
    multiplies another's cardinality."""
    from pyspark.sql import functions as F
    q = docs.selectExpr(
        id_col,
        f"size(split({text_col}, ' ')) AS __n_tokens",
        f"size(filter(split({text_col}, ' '), x -> x IN ('the', 'a')))"
        " AS __n_stop",
        f"md5(lower({text_col})) AS __text_hash")
    keeper = (q.groupBy("__text_hash")
              .agg(F.min(id_col).alias("__keeper_id")))
    rep = repetition_stats(docs, id_col=id_col, text_col=text_col).select(
        id_col, "rep_top_word_n", "rep_n_words")
    cont = contamination_hits(docs, bench_gram_df, id_col=id_col,
                              text_col=text_col).select(id_col, "cont_hits")
    j = (q.join(keeper, "__text_hash")
         .join(rep, id_col).join(cont, id_col))
    flags = {
        "pass_quality": (F.col("__n_tokens") >= min_tokens)
                        & (F.col("__n_stop") >= min_stop),
        "pass_repetition": F.col("rep_top_word_n") * top_word_mult
                           <= F.col("rep_n_words"),
        "pass_contamination": F.col("cont_hits") == 0,
        "is_keeper": F.col(id_col) == F.col("__keeper_id"),
    }
    out = j.select(id_col, *[v.cast("int").alias(k)
                             for k, v in flags.items()])
    return out.withColumn(
        "kept", ((F.col("pass_quality") == 1) & (F.col("pass_repetition") == 1)
                 & (F.col("pass_contamination") == 1)
                 & (F.col("is_keeper") == 1)).cast("int"))
