"""Distilled quality classifier: cross-engine inference equality and the
honest distillation-fidelity floor (operators/quality_model)."""

from __future__ import annotations

import duckdb
import pandas as pd

from nlp_lib_spark.operators.quality_model import (QM_BIAS, QM_FEATURES,
                                                   QM_WEIGHTS,
                                                   quality_feature_exprs,
                                                   quality_model,
                                                   quality_score_exprs)

CASES = [
    # engineered around each decision surface of the distillation target
    ("short", "the a b c"),                            # under 20 tokens
    ("no_stops", " ".join(f"w{i}" for i in range(30))),  # zero stopwords
    ("repetitive", "the " + "spam " * 30 + "a end"),   # top-word heavy
    ("good", "the quick brown fox jumps over a lazy dog "
             "while the merge sort scan window batch filter join "
             "group order value key line part hash stream runs"),
    ("exactly_20", "the " + " ".join(f"t{i}" for i in range(19))),
    ("unicode", "the café naïve über tokens here a x y z "
                "p q r s t u v w aa bb cc dd"),
]


def _duck_rows():
    feats = ",\n ".join(quality_feature_exprs("duckdb"))
    scores = ",\n ".join(quality_score_exprs())
    pdf = pd.DataFrame({"doc_id": range(len(CASES)),
                        "text": [c[1] for c in CASES]})
    con = duckdb.connect()
    con.register("p", pdf)
    rows = con.execute(f"""
WITH a AS (SELECT doc_id, text, string_split(text, ' ') AS arr FROM p),
f AS (SELECT doc_id, {feats} FROM a)
SELECT doc_id, {', '.join(QM_FEATURES)}, {scores}
FROM f ORDER BY doc_id""").fetchall()
    con.close()
    return rows


def test_cross_engine_and_score_identity(spark):
    pdf = pd.DataFrame({"doc_id": range(len(CASES)),
                        "text": [c[1] for c in CASES]})
    got = [tuple(r) for r in quality_model(
        spark.createDataFrame(pdf)).orderBy("doc_id").collect()]
    assert got == [tuple(r) for r in _duck_rows()]
    # the score column IS the frozen dot product of the feature columns
    for row in got:
        feats = dict(zip(QM_FEATURES, row[1:6]))
        score = QM_BIAS + sum(QM_WEIGHTS[f] * feats[f] for f in QM_FEATURES)
        assert row[6] == score
        assert row[7] == (1 if score > 0 else 0)


def test_expected_verdicts(spark):
    pdf = pd.DataFrame({"doc_id": range(len(CASES)),
                        "text": [c[1] for c in CASES]})
    got = {r["doc_id"]: r["qm_pred"] for r in quality_model(
        spark.createDataFrame(pdf)).collect()}
    names = [c[0] for c in CASES]
    assert got[names.index("short")] == 0
    assert got[names.index("repetitive")] == 0
    assert got[names.index("good")] == 1
    # documented distillation miss: the exact rule drops a zero-stopword
    # doc, but 30 distinct tokens outweigh the stopword term in the
    # linear model — pinned so the gap is visible, not hidden (the
    # statistical floor below bounds how often this class of miss occurs)
    assert got[names.index("no_stops")] == 1


def test_heldout_fidelity_floor():
    """Frozen-model agreement with the exact rule on the held-out corpus
    (sf0.01, never touched by the trainer): the measured 0.936/0.962/
    0.957 must not silently regress if the weights or features change."""
    rows = duckdb.sql("""
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS arr
           FROM '/root/testdata/sf0.01/documents.parquet'),
f AS (SELECT doc_id, len(arr) AS f_tokens,
        len(list_filter(arr, x -> x IN ('the', 'a'))) AS f_stop,
        length(text) AS f_chars,
        len(list_distinct(arr)) AS f_distinct,
        list_max(list_transform(list_distinct(arr),
             w -> len(list_filter(arr, x -> x = w)))) AS f_topw
      FROM d)
SELECT f_tokens, f_stop, f_chars, f_distinct, f_topw,
       CASE WHEN f_tokens >= 20 AND f_stop >= 1 AND f_topw * 8 <= f_tokens
            THEN 1 ELSE 0 END AS label
FROM f""").fetchall()
    w = [QM_WEIGHTS[f] for f in QM_FEATURES]
    tp = fp = fn = tn = 0
    for r in rows:
        pred = QM_BIAS + sum(w[j] * r[j] for j in range(5)) > 0
        y = r[-1] == 1
        tp += pred and y
        fp += pred and not y
        fn += (not pred) and y
        tn += (not pred) and not y
    acc = (tp + tn) / len(rows)
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    assert acc >= 0.93 and prec >= 0.95 and rec >= 0.95, (acc, prec, rec)
