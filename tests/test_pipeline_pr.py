"""End-to-end quality gate: planted-gold P/R and Spark-vs-oracle parity.

(a) The seeded fixture generator plants gold (subj, pred, obj) triples per
    sentence; the pipeline must recover them at P/R >= 0.95 (BASELINE.md).
(b) The distributed pipeline must agree with the single-process oracle
    EXACTLY (same kernels; any diff is a distribution bug).
(c) Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the north-rule per-row invariant.
"""

from __future__ import annotations

import pandas as pd
import pytest

from nlp_lib_spark.fixtures import FIXTURE_CONFIG, generate_transcripts
from nlp_lib_spark.kernels.pipeline import extract_turn
from nlp_lib_spark.operators.extract import extract_triples


@pytest.fixture(scope="module")
def fixture_data():
    turns, gold = generate_transcripts(n_convs=60, seed=42)
    tdf = pd.DataFrame(turns, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts_epoch"])
    gdf = pd.DataFrame(gold, columns=["conv_id", "turn_idx", "sent_id",
                                      "subj", "pred", "obj"])
    return tdf, gdf


@pytest.fixture(scope="module")
def spark_triples(spark, fixture_data):
    tdf, _ = fixture_data
    sdf = spark.createDataFrame(tdf)
    out = extract_triples(sdf, FIXTURE_CONFIG).toPandas()
    return out


def _key_set(df: pd.DataFrame) -> set[tuple]:
    return {(r.conv_id, r.turn_idx, r.sent_id,
             r.subj.lower(), r.pred, r.obj.lower())
            for r in df.itertuples()}


def test_planted_gold_precision_recall(spark_triples, fixture_data):
    _, gdf = fixture_data
    pred = _key_set(spark_triples)
    gold = _key_set(gdf)
    tp = len(pred & gold)
    precision = tp / max(1, len(pred))
    recall = tp / max(1, len(gold))
    print(f"planted-gold: P={precision:.4f} R={recall:.4f} "
          f"(pred={len(pred)} gold={len(gold)})")
    assert precision >= 0.95, (precision, sorted(pred - gold)[:10])
    assert recall >= 0.95, (recall, sorted(gold - pred)[:10])


def test_spark_matches_oracle_exactly(spark_triples, fixture_data):
    tdf, _ = fixture_data
    rt = FIXTURE_CONFIG.build()
    oracle_rows = set()
    for r in tdf.itertuples():
        for (sid, i, j, subj, pred, obj) in extract_turn(rt, r.text):
            oracle_rows.add((r.conv_id, r.turn_idx, sid, i, j,
                             subj, pred, obj))
    spark_rows = {(r.conv_id, r.turn_idx, r.sent_id, r.e1, r.e2,
                   r.subj, r.pred, r.obj)
                  for r in spark_triples.itertuples()}
    assert spark_rows == oracle_rows


def test_per_turn_text_equality_under_ordering(spark, fixture_data):
    tdf, _ = fixture_data
    sdf = spark.createDataFrame(tdf)
    # shuffle through a repartition + sort back: text must be unchanged
    out = (sdf.repartition(16, "conv_id")
              .sortWithinPartitions("conv_id", "turn_idx")
              .select("conv_id", "turn_idx", "text")
              .toPandas()
              .sort_values(["conv_id", "turn_idx"])
              .reset_index(drop=True))
    exp = (tdf[["conv_id", "turn_idx", "text"]]
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def test_determinism_two_runs(spark, fixture_data):
    tdf, _ = fixture_data
    sdf = spark.createDataFrame(tdf)
    a = extract_triples(sdf, FIXTURE_CONFIG).toPandas()
    b = extract_triples(sdf.repartition(7), FIXTURE_CONFIG).toPandas()
    key = ["conv_id", "turn_idx", "sent_id", "e1", "e2"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_triples_from_annotations_equals_fused_path(spark, fixture_data):
    """The staged path (annotate_turns -> triples_from_annotations) must
    emit exactly the fused extract_triples output — the invariant that
    lets kg_edges reuse one annotation pass for mentions AND triples."""
    from nlp_lib_spark.operators.extract import (annotate_turns,
                                                 triples_from_annotations)
    tdf, _ = fixture_data
    sdf = spark.createDataFrame(tdf)
    fused = extract_triples(sdf, FIXTURE_CONFIG).toPandas()
    staged = triples_from_annotations(
        annotate_turns(sdf, FIXTURE_CONFIG)).toPandas()
    key = ["conv_id", "turn_idx", "sent_id", "e1", "e2",
           "subj", "pred", "obj"]
    assert (set(map(tuple, fused[key].itertuples(index=False)))
            == set(map(tuple, staged[key].itertuples(index=False))))
    assert len(fused) == len(staged)


def test_straggler_guards():
    """Degenerate rows must not pin a core: oversize sentences and
    mention floods skip extraction in ~constant time (KGConfig guards)."""
    import time

    from nlp_lib_spark.kernels.pipeline import extract_turn
    rt = FIXTURE_CONFIG.build()
    t0 = time.time()
    assert extract_turn(rt, "spark " * 2000) == []
    assert extract_turn(rt, "spark interacts with table and " * 300) == []
    assert time.time() - t0 < 1.0
    # empty / whitespace / punctuation-only inputs are quiet no-ops
    for s in ("", "   ", ".", "(", "(("):
        assert extract_turn(rt, s) == []


def test_flood_guard_does_not_crash_ml_and_kernel_paths(spark):
    """Review regression: a mention-flood sentence must flow through the
    ML and kernel-scoring operators (annotation layers kept, extraction
    skipped) instead of crashing on edges=None."""
    from nlp_lib_spark.kernels.scoring import DEFAULT_MODEL_PATH, load_model
    from nlp_lib_spark.operators.kernel_score import (build_prototypes,
                                                      extract_triples_kernel)
    from nlp_lib_spark.operators.ml import extract_triples_ml
    flood = "spark interacts with table and " * 43  # 86 mentions > 64
    df = spark.createDataFrame([("c1", 0, flood)],
                               "conv_id string, turn_idx int, text string")
    w, b = load_model(DEFAULT_MODEL_PATH)
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    assert extract_triples_ml(df, TESTDATA_CONFIG, w, b).count() == 0
    protos = build_prototypes(TESTDATA_CONFIG,
                              ["the spark activates the table."])
    assert extract_triples_kernel(df, TESTDATA_CONFIG, protos).count() == 0


def test_oversize_sentence_dropped_from_annotations(spark):
    """Oversize token runs vanish from the annotations table entirely
    (mirroring the token-count filter in the annotation oracles)."""
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    from nlp_lib_spark.operators.extract import annotate_turns
    rows = [("c1", 0, "the spark activates the table."),
            ("c1", 1, "x " * 400)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "text string")
    ann = annotate_turns(df, TESTDATA_CONFIG).collect()
    assert {(r.conv_id, r.turn_idx) for r in ann} == {("c1", 0)}
