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
# (DuckDB oracle): character classes, bounded repetition, non-capturing
# groups, \b, \+? — no backreferences, no lookaround. Detection counts are
# taken BEFORE scrubbing; replacement runs most-specific-first (card ->
# SSN -> phone -> email -> IP) so overlapping digit runs cannot
# double-scrub.
#
# Separator-less 16-digit card numbers can't be told from invoice/serial
# numbers by shape alone, so the ``ccn16`` entry carries a ``luhn``
# validator: candidates come from the regex, but only Luhn-valid ones are
# counted/scrubbed — the checksum is a SQL fold over the 16 digits
# (``aggregate`` in Spark, ``list_transform``+``list_sum`` in the DuckDB
# oracle), still zero Python and zero lookaround. \b\d{16}\b also makes
# a 17+-digit run unmatched in BOTH engines (no boundary between digits),
# which the adversarial fixtures pin.

PII_PATTERNS = (
    # (name, raw regex, replacement tag, validator)
    ("ccn", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "<CCN>", None),
    ("ccn16", r"\b\d{16}\b", "<CCN>", "luhn"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>", None),
    ("phone", r"\+?\d{1,2} \d{3}-\d{3}-\d{4}", "<PHONE>", None),
    # E.164 without spaces: + then 8-15 digits (ITU max), boundary-closed
    # so a longer digit run does not half-match
    ("e164", r"\+\d{8,15}\b", "<PHONE>", None),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
     , None),
    # full-form (8-group) IPv6; ::-compressed forms are documented out of
    # scope — RE2 has no lookaround to anchor the variable-group forms
    # without overmatching bare hex words
    ("ipv6", r"\b(?:[0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}\b", "<IP>", None),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>", None),
)


def luhn_valid_sql(var: str, dialect: str) -> str:
    """Boolean SQL: the 16-digit string ``var`` passes the Luhn checksum.

    A fold over digit positions 1..16 from the right — doubled on even
    positions, folded down past 9 — expressed in each engine's native
    list/array comprehension so the gate can replay the identical
    arithmetic: Spark ``aggregate(sequence(...))``, DuckDB
    ``list_sum(list_transform(range(...)))``. Integer-only, so the
    verdict is bit-exact across engines."""
    d = f"CAST(substring({var}, 17 - j, 1) AS INT)"
    body = (f"CASE WHEN j % 2 = 0 THEN CASE WHEN 2 * {d} > 9 "
            f"THEN 2 * {d} - 9 ELSE 2 * {d} END ELSE {d} END")
    if dialect == "spark":
        return (f"aggregate(sequence(1, 16), 0, (s, j) -> s + {body})"
                " % 10 = 0")
    return (f"list_sum(list_transform(range(1, 17), j -> {body}))"
            " % 10 = 0")


def _pii_count_sql(text: str, pat: str, validator: str | None,
                   dialect: str) -> str:
    """Count of matches (validator-filtered if one is attached)."""
    if dialect == "spark":
        esc = pat.replace(chr(92), chr(92) * 2)
        matches = f"regexp_extract_all({text}, '{esc}', 0)"
        if validator is None:
            return f"size({matches})"
        return (f"size(filter({matches}, "
                f"c -> {luhn_valid_sql('c', dialect)}))")
    matches = f"regexp_extract_all({text}, '{pat}')"
    if validator is None:
        return f"len({matches})"
    return (f"len(list_filter({matches}, "
            f"c -> {luhn_valid_sql('c', dialect)}))")


def _pii_scrub_step_sql(prev: str, pat: str, tag: str,
                        validator: str | None, dialect: str) -> str:
    """One replacement link of the scrub chain wrapped around ``prev``.

    Validator-less patterns are a plain ``regexp_replace``; validated
    ones fold ``replace`` over the filtered candidate list (Spark
    ``aggregate`` with the text as the accumulator seed; DuckDB
    ``list_reduce`` over ``list_prepend(text, candidates)`` — the
    prepended text doubles as the seed, and an empty candidate list then
    reduces to the text unchanged)."""
    if validator is None:
        if dialect == "spark":
            esc = pat.replace(chr(92), chr(92) * 2)
            return f"regexp_replace({prev}, '{esc}', '{tag}')"
        return f"regexp_replace({prev}, '{pat}', '{tag}', 'g')"
    if dialect == "spark":
        esc = pat.replace(chr(92), chr(92) * 2)
        cands = (f"filter(regexp_extract_all({prev}, '{esc}', 0), "
                 f"c -> {luhn_valid_sql('c', dialect)})")
        return (f"aggregate({cands}, {prev}, "
                f"(acc, x) -> replace(acc, x, '{tag}'))")
    cands = (f"list_filter(regexp_extract_all({prev}, '{pat}'), "
             f"c -> {luhn_valid_sql('c', dialect)})")
    return (f"list_reduce(list_prepend({prev}, {cands}), "
            f"(acc, x) -> replace(acc, x, '{tag}'))")


def pii_scrub_exprs(text_col: str, dialect: str) -> tuple[list[str], str]:
    """(count expressions aliased ``n_<name>``, scrubbed-text expression)
    for one dialect — shared by the operator (spark) and the gate's
    DuckDB oracle so the two engines replay the SAME pattern set by
    construction."""
    counts = [
        f"{_pii_count_sql(text_col, pat, validator, dialect)} AS n_{name}"
        for name, pat, _, validator in PII_PATTERNS]
    scrub = text_col
    for _, pat, tag, validator in PII_PATTERNS:
        scrub = _pii_scrub_step_sql(scrub, pat, tag, validator, dialect)
    return counts, scrub


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII detection counts + the md5 of the scrubbed text.

    Pure JVM-side SQL (regexp_extract_all / chained regexp_replace /
    Luhn-filtered replace folds inside whole-stage codegen — no Python
    in the path), so at 100 TB this runs at scan speed with zero
    shuffles; the gate's DuckDB oracle replays the same patterns through
    RE2 and the same checksum arithmetic through list folds."""
    counts, scrub = pii_scrub_exprs(text_col, "spark")
    counts_sql = ",\n       ".join(counts)
    return _sql(df, f"""
SELECT {id_col},
       {counts_sql},
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


# ------------------------------------------------------- URL / domain stats
# Web-scale corpora are filtered by URL provenance before anything else
# (C4 dropped pages whose domain hit a blocklist; every crawl pipeline
# tracks per-domain volume). The corpus here carries text-embedded URLs,
# so the operator extracts them with a regex restricted to the shared
# Java/RE2 subset (char classes + one capture group, no lookaround) and
# reduces row-locally: counts, distinct domains, and blocklist verdicts
# are all array expressions inside one codegen'd projection — ZERO
# Exchanges, zero Python, scan speed at 100 TB.

# host = capture group 1; the full match count equals the host count, so
# one extraction serves both. Greedy [A-Za-z0-9.-]+ absorbs a trailing
# dot ("https://x.org." -> host "x.org.") — identically in both engines;
# the registered-domain anchor then rejects it (no trailing alnum), which
# the adversarial fixtures pin.
URL_HOST_PAT = r"https?://([A-Za-z0-9.-]+)"
# registered domain = last two labels, anchored at end of host
REG_DOMAIN_PAT = r"([a-z0-9-]+\.[a-z0-9-]+)$"


def _re_lit(pat: str, dialect: str) -> str:
    """Regex as a SQL string literal: Spark string literals process
    backslash escapes (double them), DuckDB's do not; quotes double in
    both."""
    pat = pat.replace("'", "''")
    return pat.replace("\\", "\\\\") if dialect == "spark" else pat


def url_stats_exprs(text_col: str, dialect: str,
                    blocklist: tuple[str, ...]) -> list[str]:
    """Aliased column expressions (n_urls, n_domains, n_blocked_urls,
    url_blocked, first_reg_domain) for one dialect — shared by the
    operator (spark) and the gate's DuckDB oracle so both engines replay
    the same pattern set and the same blocklist by construction."""
    host = _re_lit(URL_HOST_PAT, dialect)
    reg = _re_lit(REG_DOMAIN_PAT, dialect)
    blist = ", ".join("'" + b.replace("'", "''") + "'" for b in blocklist)
    if dialect == "spark":
        hosts = (f"transform(regexp_extract_all({text_col}, '{host}', 1), "
                 f"h -> lower(h))")
        size, distinct, filt = "size", "array_distinct", "filter"
        first = f"{hosts}[0]"
    else:
        hosts = (f"list_transform(regexp_extract_all({text_col}, "
                 f"'{host}', 1), h -> lower(h))")
        size, distinct, filt = "len", "list_distinct", "list_filter"
        first = f"{hosts}[1]"
    blocked = (f"{size}({filt}({hosts}, "
               f"h -> regexp_extract(h, '{reg}', 1) IN ({blist})))")
    return [
        f"CAST({size}({hosts}) AS BIGINT) AS n_urls",
        f"CAST({size}({distinct}({hosts})) AS BIGINT) AS n_domains",
        f"CAST({blocked} AS BIGINT) AS n_blocked_urls",
        f"CAST(CASE WHEN {blocked} > 0 THEN 1 ELSE 0 END AS INT)"
        " AS url_blocked",
        f"CASE WHEN {size}({hosts}) > 0"
        f" THEN regexp_extract({first}, '{reg}', 1) ELSE '-' END"
        " AS first_reg_domain",
    ]


def url_stats(df: DataFrame, blocklist: tuple[str, ...],
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document URL provenance: URL count, distinct (lowercased)
    domain count, blocklisted-URL count + 0/1 verdict, and the first
    URL's registered domain ('-' if the document has no URL).

    The blocklist is matched on the registered domain (last two host
    labels), so "ads.spam-net.biz" is blocked by entry "spam-net.biz".
    Entries arrive as bound literals with quotes escaped — a metacharacter
    in a blocklist entry is data, never SQL syntax."""
    cols = ",\n       ".join(url_stats_exprs(text_col, "spark", blocklist))
    return _sql(df, f"SELECT {id_col},\n       {cols}\nFROM {{t}}")


def domain_freq(df: DataFrame, k: int = 20, text_col: str = "text",
                min_count: int = 1) -> DataFrame:
    """Corpus-level registered-domain frequency top-k (ties broken by
    domain): one explode of the row-local host array, then a single
    bounded-key aggregation (key cardinality = number of registered
    domains, with map-side partial combine) — the standard crawl-volume
    report. -> (reg_domain, n_urls)."""
    from pyspark.sql import functions as F
    host = _re_lit(URL_HOST_PAT, "spark")
    hosts = (f"transform(regexp_extract_all({text_col}, '{host}', 1), "
             f"h -> lower(h))")
    return (df.select(F.explode(F.expr(hosts)).alias("host"))
            .select(F.regexp_extract("host", REG_DOMAIN_PAT, 1)
                     .alias("reg_domain"))
            .filter(F.col("reg_domain") != "")
            .groupBy("reg_domain").agg(F.count(F.lit(1)).alias("n_urls"))
            .filter(F.col("n_urls") >= min_count)
            .orderBy(F.desc("n_urls"), "reg_domain").limit(k))


# --------------------------------------------- decontamination normalization
# GPT-3/PaLM-style decontamination normalizes BEFORE n-gram matching
# (lowercase, strip punctuation, collapse whitespace): an eval question
# re-typeset with different case/punctuation must still be caught. The
# normalizer is one regexp_replace inside the scan projection — the
# contamination screen's plan shape is unchanged.

def normalize_for_decontam_sql(text_col: str, dialect: str) -> str:
    """SQL expression: lowercase, non-alphanumeric runs collapsed to one
    space, trimmed. Spark regexp_replace is global by default; DuckDB
    needs the 'g' flag."""
    pat = "[^a-z0-9]+"
    if dialect == "spark":
        return f"trim(regexp_replace(lower({text_col}), '{pat}', ' '))"
    return f"trim(regexp_replace(lower({text_col}), '{pat}', ' ', 'g'))"


def normalize_for_decontam(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """-> (id, text) with the decontamination normalization applied."""
    return _sql(df, f"""
SELECT {id_col}, {normalize_for_decontam_sql(text_col, 'spark')} AS {text_col}
FROM {{t}}
""")
