"""LM perplexity filter: Spark vs an independent pure-Python model.

The DuckDB oracle parity is covered by test_gate_parity (doc_lm_filter);
here the Spark operator is checked against a from-scratch Python
implementation of the same integer code-length model, over seeded random
corpora designed to hit the edges (empty docs, one-token docs, unseen
words, repeated bigrams, multi-space runs producing empty tokens).
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from nlp_lib_spark.operators.lm_filter import lm_filter


def _py_model(docs: list[tuple[int, str]], train_mod: int = 3) -> dict:
    def bitlen(x: int) -> int:
        return max(1, x.bit_length())

    tr = [t.split(" ") for i, t in docs if i % train_mod == 0]
    vocab = {w for a in tr for w in a}
    v = len(vocab)
    uni: Counter = Counter()
    big: Counter = Counter()
    for a in tr:
        for x, y in zip(a, a[1:]):
            uni[x] += 1
            big[(x, y)] += 1
    per = {}
    for i, t in docs:
        a = t.split(" ")
        if len(a) < 2:
            per[i] = (0, -1, -1)
            continue
        bits = sum(bitlen(uni[x] + v) - bitlen(big[(x, y)] + 1)
                   for x, y in zip(a, a[1:]))
        n = len(a) - 1
        per[i] = (n, bits, bits * 1000 // n)
    scored = sorted(m for n, _, m in per.values() if n >= 1)
    hist = sorted(Counter(scored).items())
    total = len(scored)

    def thresh(mult: int) -> int | None:
        cum = 0
        for s, c in hist:
            cum += c
            if cum * 3 >= total * mult:
                return s
        return None

    t1, t2 = thresh(1), thresh(2)
    out = {}
    for i, (n, bits, milli) in per.items():
        if n == 0:
            b = "na"
        elif milli <= t1:
            b = "head"
        elif milli <= t2:
            b = "middle"
        else:
            b = "tail"
        out[i] = (n, bits, milli, b)
    return out


WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "q", "zz", ""]


def _rand_corpus(seed: int, n_docs: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        k = rng.choice([0, 0, 1, 2, 3, 5, 8, 20])
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(k))))
    return docs


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_lm_filter_matches_python_model(spark, seed):
    docs = _rand_corpus(seed, 60)
    expected = _py_model(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.lm_n_bigrams, r.lm_bits, r.lm_milli_bits,
                      r.lm_bucket)
           for r in lm_filter(df).collect()}
    assert got == expected


def test_lm_filter_bucket_order(spark):
    docs = _rand_corpus(3, 120)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = lm_filter(df).collect()
    by_bucket: dict[str, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r.lm_bucket, []).append(r.lm_milli_bits)
    # terciles are ordered and partition the scored docs
    if "head" in by_bucket and "middle" in by_bucket:
        assert max(by_bucket["head"]) < min(by_bucket["middle"])
    if "middle" in by_bucket and "tail" in by_bucket:
        assert max(by_bucket["middle"]) < min(by_bucket["tail"])
    assert all(m == -1 for m in by_bucket.get("na", [-1]))


def test_lm_filter_rejects_bad_train_mod(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_filter(df, train_mod=0)
