"""ML (MaxEnt) relation-extraction path: held-out P/R + determinism."""

from __future__ import annotations

import pandas as pd
import pytest

from nlp_lib_spark.fixtures import FIXTURE_CONFIG, generate_transcripts
from nlp_lib_spark.kernels.scoring import DEFAULT_MODEL_PATH, load_model
from nlp_lib_spark.operators.ml import extract_triples_ml


@pytest.fixture(scope="module")
def model():
    return load_model(DEFAULT_MODEL_PATH)


def test_ml_heldout_precision_recall(spark, model):
    weights, bias = model
    # held-out: different seed from the training corpus (42)
    turns, gold = generate_transcripts(n_convs=40, seed=99)
    tdf = spark.createDataFrame(pd.DataFrame(
        turns, columns=["conv_id", "turn_idx", "role", "text", "tool",
                        "ts_epoch"]))
    out = extract_triples_ml(tdf, FIXTURE_CONFIG, weights, bias).toPandas()
    pred = {(r.conv_id, r.turn_idx, r.sent_id, r.subj.lower(), r.obj.lower())
            for r in out.itertuples()}
    goldset = {(c, t, s, subj, obj) for (c, t, s, subj, _p, obj) in gold}
    tp = len(pred & goldset)
    precision = tp / max(1, len(pred))
    recall = tp / max(1, len(goldset))
    assert precision >= 0.95, (precision, sorted(pred - goldset)[:5])
    assert recall >= 0.95, (recall, sorted(goldset - pred)[:5])


def test_ml_scores_in_range_and_deterministic(spark, model):
    weights, bias = model
    turns, _ = generate_transcripts(n_convs=10, seed=5)
    tdf = spark.createDataFrame(pd.DataFrame(
        turns, columns=["conv_id", "turn_idx", "role", "text", "tool",
                        "ts_epoch"]))
    a = extract_triples_ml(tdf, FIXTURE_CONFIG, weights, bias).toPandas()
    b = extract_triples_ml(tdf.repartition(5), FIXTURE_CONFIG,
                           weights, bias).toPandas()
    key = ["conv_id", "turn_idx", "sent_id", "e1", "e2"]
    pd.testing.assert_frame_equal(a.sort_values(key).reset_index(drop=True),
                                  b.sort_values(key).reset_index(drop=True))
    assert ((a.p > 0.5) & (a.p <= 1.0)).all()
