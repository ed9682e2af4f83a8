"""Round-5 pipeline additions: URL/domain stats, normalized
decontamination, and real BPE token counting.

Every adversarial fixture runs through BOTH engines — Spark via the
operator, DuckDB via the same shared expression builders / the recursive
CTE oracle — so the assertions pin cross-engine agreement on exactly the
inputs most likely to diverge (trailing-dot hosts, case folding, merge
ties, overlap chains)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from nlp_lib_spark.operators.bpe import (BPE_MERGES, bpe_merges_values_sql,
                                         bpe_recursive_cte_sql,
                                         bpe_token_counts, bpe_word)
from nlp_lib_spark.operators.textstats import (domain_freq,
                                               normalize_for_decontam_sql,
                                               url_stats, url_stats_exprs)

BLOCKLIST = ("spam-net.biz", "tracker.example", "o'block.test")

URL_CASES = [
    # (case_id, text, n_urls, n_domains, n_blocked, blocked, first_reg)
    ("plain", "see https://site1.example.com/p/1 ok",
     1, 1, 0, 0, "example.com"),
    ("same_domain_twice",
     "https://a.example.com/x and https://A.Example.COM/y",
     2, 1, 0, 0, "example.com"),
    ("blocked_subdomain", "via http://ads.spam-net.biz/track?id=7",
     1, 1, 1, 1, "spam-net.biz"),
    ("mixed", "https://ok.example.org/a then http://x.spam-net.biz/b",
     2, 2, 1, 1, "example.org"),
    ("no_scheme_www", "at www.nourl.example.com thanks",
     0, 0, 0, 0, "-"),
    # greedy host absorbs the trailing dot; the registered-domain anchor
    # (no trailing alnum) must then reject it -> empty reg domain
    ("trailing_dot", "tail https://end.example.org. x",
     1, 1, 0, 0, ""),
    # ':' is outside the host char class, so the port ends the host
    ("port", "on https://x.example.net:8080/p q",
     1, 1, 0, 0, "example.net"),
    ("no_urls", "no urls here at all", 0, 0, 0, 0, "-"),
    # a quote in a blocklist entry is data, not SQL syntax (the query
    # must run, not error); it can never match, since ' is outside the
    # host char class — the host ends at the apostrophe
    ("quoted_entry", "q https://cdn.o'block.test/x r",
     1, 1, 0, 0, "cdn.o"),
]


def _duck_url_rows():
    cols = ",\n ".join(url_stats_exprs("text", "duckdb", BLOCKLIST))
    pdf = pd.DataFrame({"doc_id": range(len(URL_CASES)),
                        "text": [c[1] for c in URL_CASES]})
    con = duckdb.connect()
    con.register("p", pdf)
    out = con.execute(
        f"SELECT doc_id, {cols} FROM p ORDER BY doc_id").fetchall()
    con.close()
    return out


@pytest.fixture(scope="module")
def spark_url_rows(spark):
    pdf = pd.DataFrame({"doc_id": range(len(URL_CASES)),
                        "text": [c[1] for c in URL_CASES]})
    df = url_stats(spark.createDataFrame(pdf), BLOCKLIST)
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


@pytest.mark.parametrize("i,case", list(enumerate(URL_CASES)),
                         ids=[c[0] for c in URL_CASES])
def test_url_stats_expected(spark_url_rows, i, case):
    _, _, n_urls, n_dom, n_blk, blocked, first = case
    assert spark_url_rows[i] == (i, n_urls, n_dom, n_blk, blocked, first)


def test_url_stats_cross_engine(spark_url_rows):
    assert [tuple(r) for r in _duck_url_rows()] == spark_url_rows


def test_domain_freq_topk(spark):
    pdf = pd.DataFrame({"doc_id": range(len(URL_CASES)),
                        "text": [c[1] for c in URL_CASES]})
    got = [tuple(r) for r in domain_freq(
        spark.createDataFrame(pdf), k=3).collect()]
    # example.com x3 (plain + same_domain_twice x2), spam-net.biz x2,
    # then the k=3 tie at n=1 resolves lexicographically (cdn.o first)
    assert got == [("example.com", 3), ("spam-net.biz", 2),
                   ("cdn.o", 1)]


NORM_CASES = [
    "Hello, World!  42",
    "UPPER lower MiXeD",
    "a, b,, c--d__e",
    "   leading and trailing   ",
    "already clean text",
]


def test_normalizer_cross_engine_and_idempotent(spark):
    pdf = pd.DataFrame({"t": NORM_CASES})
    sdf = spark.createDataFrame(pdf)
    s_expr = normalize_for_decontam_sql("t", "spark")
    got_s = [r[0] for r in sdf.selectExpr(f"{s_expr} AS n").collect()]
    con = duckdb.connect()
    con.register("p", pdf)
    got_d = [r[0] for r in con.execute(
        "SELECT " + normalize_for_decontam_sql("t", "duckdb")
        + " AS n FROM p").fetchall()]
    con.close()
    assert got_s == got_d
    # idempotent: normalizing a normalized string is the identity
    got_s2 = [r[0] for r in spark.createDataFrame(
        pd.DataFrame({"t": got_s})).selectExpr(f"{s_expr} AS n").collect()]
    assert got_s2 == got_s
    assert got_s[0] == "hello world 42"
    assert got_s[1] == "upper lower mixed"
    assert got_s[2] == "a b c d e"


# ------------------------------------------------------------------- BPE

def test_bpe_word_basics():
    assert bpe_word("window") == ["window"]
    assert bpe_word("column") == ["column"]
    assert bpe_word("customer") == ["c", "u", "st", "o", "mer"]
    assert bpe_word("a") == ["a"]
    assert bpe_word("") == []
    # chars outside the merge alphabet stay single symbols
    assert bpe_word("zzz") == ["z", "z", "z"]


def test_bpe_min_rank_beats_leftmost():
    # rank decides WHICH pair merges; position only breaks ties within
    # one pair: with ranks {bc:0, ab:1}, "abc" must merge bc first
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe_word("abc", ranks) == ["a", "bc"]
    # overlap chain: leftmost occurrence of the best pair wins each step
    ranks2 = {("a", "a"): 0}
    assert bpe_word("aaa", ranks2) == ["aa", "a"]
    # after 'aa aa' forms, (aa,aa) has no rank — recursion must stop
    assert bpe_word("aaaa", ranks2) == ["aa", "aa"]


def _duck_bpe(words: list[str]) -> dict[str, str]:
    # the SAME CTE builder the gate oracle splices (drift-proof: a fix
    # to the replay logic lands in both places by construction)
    con = duckdb.connect()
    con.register("w0", pd.DataFrame({"word": words}))
    rows = con.execute(f"""
WITH RECURSIVE
m(rank, l, r) AS (VALUES {bpe_merges_values_sql()}),
{bpe_recursive_cte_sql('w0')}
SELECT word, toks FROM tok
""").fetchall()
    con.close()
    return dict(rows)


def test_bpe_python_vs_duckdb_fuzz():
    import random
    rng = random.Random(424242)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(1, 12)))
             for _ in range(300)]
    # stack the deck with merge-table substrings so merges actually fire
    words += [l + r for l, r in BPE_MERGES]
    words += ["sortsort", "window", "columncolumn", "erererer",
              "scascasca", "parpar", "atat"]
    # RE2 '.' skips newlines; the oracle's (?s) flag must keep them —
    # these pin the fix (list(word) and the CTE split must agree)
    words += ["foo\nbar", "a\tb", "\nwindow", "sort\n"]
    got = _duck_bpe(words)
    for w in set(words):
        assert got[w] == " ".join(bpe_word(w)), w


def test_bpe_token_counts_spark(spark):
    texts = ["the window sort order",
             "customer data batch window window",
             "spark spark scan",
             "zzz unknownword the"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_md5"])
           for r in bpe_token_counts(spark.createDataFrame(pdf)).collect()}
    import hashlib
    for i, t in enumerate(texts):
        toks = [s for w in t.split(" ") if w for s in bpe_word(w)]
        md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[i] == (len(toks), md5), (i, t)
