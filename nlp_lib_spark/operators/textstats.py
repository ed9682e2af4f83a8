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
