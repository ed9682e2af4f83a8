"""Sense-classifier runtime: trained softmax model + prediction operator.

Covers the ``PDTBNewConnectiveSenseTrainer`` / ``SenseExtractor`` slot:
the committed integer model must (a) reproduce the synthetic annotation
rule on held-out context-flip pairs — i.e. genuinely read context, not
just the ``CAT=`` lexicon prior — and (b) agree between the Python
kernel scorer, the Spark operator, and hand-computed integer sums.
"""

from __future__ import annotations

import pytest

from nlp_lib_spark.kernels.connfeatures import sense_features
from nlp_lib_spark.kernels.constit import build_tree
from nlp_lib_spark.kernels.discourse import ConnectiveLexicon, arg2_head
from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.scoring import (quantize_softmax,
                                           score_softmax_int,
                                           train_softmax)
from nlp_lib_spark.kernels.tree import parse_penn
from nlp_lib_spark.lexicons import TESTDATA_CONFIG
from nlp_lib_spark.resources import model_json

# (sentence, connective, expected sense) — the ambiguous connectives flip
# with the chunk right of the connective (scripts/train_sense.py AMBIG);
# none of these sentences appear verbatim in the training corpus.
FLIP_CASES = [
    ("the column binds the vector since inhibits the stream .",
     "since", "Temporal"),
    ("the column binds the vector since the stream was observed .",
     "since", "Contingency"),
    ("the customer regulates the query when activates the part .",
     "when", "Contingency"),
    ("when the part was observed , the customer regulates the query .",
     "when", "Temporal"),
    ("the data inhibits the key but regulates the row .",
     "but", "Expansion"),
    ("the data inhibits the key but the row was observed .",
     "but", "Comparison"),
    ("the batch was observed then activates the window .",
     "then", "Contingency"),
    ("the batch was observed , then the window was observed .",
     "then", "Temporal"),
    ("however , the table binds the spark .", "however", "Comparison"),
    ("moreover , the table binds the spark .", "moreover", "Expansion"),
]


def _predict_one(sentence: str, model: dict) -> tuple[str, str, int]:
    rt = TESTDATA_CONFIG.build()
    lex = ConnectiveLexicon()
    ann = annotate_sentence(rt, sentence, full=True)
    assert ann is not None
    toks, pos = ann["blinded"], ann["pos"]
    spans = lex.find(toks)
    assert spans, sentence
    span = spans[0]
    a2h = arg2_head(toks, pos, span)
    assert a2h >= 0
    tree = parse_penn(build_tree(toks, pos))
    feats = sense_features(toks, pos, tree, span[0], span[1], a2h,
                           lex.sense(toks, span))
    pred, sc = score_softmax_int(feats, model["weights"], model["biases"],
                                 sorted(model["classes"]))
    conn = " ".join(t.lower() for t in toks[span[0]:span[1] + 1])
    return conn, pred, sc


@pytest.mark.parametrize("sentence,conn,expected", FLIP_CASES)
def test_committed_model_context_flips(sentence, conn, expected):
    model = model_json("sense_me.json")
    got_conn, pred, _ = _predict_one(sentence, model)
    assert got_conn == conn
    assert pred == expected


def test_score_softmax_int_hand_golden():
    weights = {"A": {"f1": 5, "f2": -2}, "B": {"f1": 1, "f3": 10}}
    biases = {"A": 0, "B": 1}
    # duplicate f1 counts twice: A = 0+5+5-2 = 8, B = 1+1+1 = 3
    pred, sc = score_softmax_int(["f1", "f1", "f2"], weights, biases,
                                 ["A", "B"])
    assert (pred, sc) == ("A", 8)
    # tie -> lexicographically smallest class wins (strict >)
    pred, sc = score_softmax_int([], {"A": {}, "B": {}},
                                 {"A": 7, "B": 7}, ["A", "B"])
    assert (pred, sc) == ("A", 7)


def test_train_softmax_learns_xor_of_context():
    # CAT alone cannot separate; context feature must carry the decision
    xs = [["CAT=X", "CTX=V"], ["CAT=X"], ["CAT=Y", "CTX=V"], ["CAT=Y"]] * 30
    ys = (["ALT", "X", "ALT", "Y"]) * 30
    classes = sorted(set(ys))
    w, b = train_softmax(xs, ys, classes, epochs=60, lr=0.3, seed=1)
    wq, bq = quantize_softmax(w, b)
    preds = [score_softmax_int(x, wq, bq, classes)[0] for x in xs[:4]]
    assert preds == ["ALT", "X", "ALT", "Y"]


def test_committed_model_margin_and_shape():
    m = model_json("sense_me.json")
    assert sorted(m["classes"]) == ["Comparison", "Contingency",
                                    "Expansion", "Temporal"]
    assert m["scale"] == 1_000_000
    for c in m["classes"]:
        assert c in m["weights"] and c in m["biases"]
        assert all(isinstance(v, int) and v != 0
                   for v in m["weights"][c].values())


def test_sense_predictions_operator_matches_kernel(spark):
    """The Spark operator must agree row-for-row with the driver-side
    kernel loop on a multi-partition input."""
    model = model_json("sense_me.json")
    rows = [(f"c{i}", 0, FLIP_CASES[i % len(FLIP_CASES)][0])
            for i in range(12)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "text string")
    from nlp_lib_spark.operators.discourse import sense_predictions
    from nlp_lib_spark.operators.extract import annotate_turns
    ann = annotate_turns(df.repartition(4), TESTDATA_CONFIG)
    out = sense_predictions(ann, model).toPandas()
    assert len(out) == 12
    for r in out.itertuples(index=False):
        sent = FLIP_CASES[int(r.conv_id[1:]) % len(FLIP_CASES)][0]
        _, pred, sc = _predict_one(sent, model)
        assert (r.pred_sense, int(r.score)) == (pred, sc)
