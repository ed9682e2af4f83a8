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


def test_prune_by_count():
    from nlp_lib_spark.kernels.scoring import prune_by_count
    x = [["a", "b"], ["a", "c"], ["a", "b"]]
    # counts: a=3, b=2, c=1; prune_count=1 keeps strictly >1 (java:40)
    assert prune_by_count(x, 1) == [["a", "b"], ["a"], ["a", "b"]]
    assert prune_by_count(x, 0) == x


def test_info_gain_and_prune():
    from nlp_lib_spark.kernels.scoring import info_gain, prune_by_info_gain
    # f1 perfectly separates labels; f2 is uninformative
    x = [["f1", "f2"], ["f1"], ["f2"], []]
    y = [1, 1, 0, 0]
    ig = info_gain(x, y)
    assert ig["f1"] == pytest.approx(1.0)  # H(Y)=1, perfectly split
    assert ig["f2"] == pytest.approx(0.0)
    pruned = prune_by_info_gain(x, y, k=1)
    assert pruned == [["f1"], ["f1"], [], []]


def test_gram_matrix_distributed(spark):
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.kernelscore import (lcs_dep_path_kernel,
                                                   relation_instance)
    from nlp_lib_spark.operators.kernel_score import gram_matrix

    def inst(verb, dom):
        return relation_instance(
            ["PROTEIN1", verb, "PROTEIN2"], ["NN", "VBZ", "NN"],
            [None, dom, None], DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)]),
            0, 2)
    insts = [inst("activates", "activate"), inst("binds", "bind"),
             inst("inhibits", "inhibit")]
    got = {(r.i, r.j): r.k for r in gram_matrix(spark, insts).collect()}
    assert len(got) == 9
    for i in range(3):
        assert got[(i, i)] == pytest.approx(1.0)      # normalized self
        for j in range(3):
            assert got[(i, j)] == got[(j, i)]          # symmetry
            assert got[(i, j)] == pytest.approx(
                round(lcs_dep_path_kernel(insts[i], insts[j]), 6))


def test_synset_mapper():
    from nlp_lib_spark.kernels.synsets import (parse_synsets, syn_match,
                                               syn_set)
    lines = ["bind", "(101)", "(102)", "", "attach", "(102)", "",
             "orphan", "", "activate", "(200)", ""]
    m = parse_synsets(lines)
    assert m == {"bind": frozenset({101, 102}),
                 "attach": frozenset({102}),
                 "activate": frozenset({200})}
    assert "orphan" not in m  # zero-id words omitted (java:37-39)
    assert syn_set(m, "BIND") == frozenset({101, 102})  # lowercase lookup
    assert syn_match(m, "bind", "attach")
    assert not syn_match(m, "bind", "activate")
    assert not syn_match(m, "bind", "unknown")


def test_pair_features_v1_families():
    """PPIPipe v1 families (goldens on a hand-checked sentence)."""
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.features import pair_features_v1
    from nlp_lib_spark.kernels.pipeline import annotate_sentence
    rt = FIXTURE_CONFIG.build()
    ann = annotate_sentence(rt, "the TagA strongly activates the GerE .")
    assert ann["entity_count"] == 2
    g = DepGraph(ann["edges"])
    e1 = ann["blinded"].index("PROTEIN0")
    e2 = ann["blinded"].index("PROTEIN1")
    feats = pair_features_v1(ann["blinded"], ann["pos"],
                             ann["domain"], g, e1, e2)
    fmap = dict(f.split("=", 1) for f in feats)
    # the subj edge's traversal target is the DOMAIN-tagged verb
    assert fmap["SBJ"] == "activates"
    # the verb 'activates' on the path sets the domain flag
    assert fmap["DOMAIN"] == "True"
    # v1 collapse dedupes consecutive classes: -nsubj then dobj -> subj:o:
    assert fmap["CPATH"] == "subj:o:"
    assert fmap["FORM-TYPE"] == "1"
    assert fmap["LCS"] == "1-activates"
    assert fmap["PP"] == "NONE"
    # deterministic
    assert feats == pair_features_v1(ann["blinded"], ann["pos"],
                                     ann["domain"], g, e1, e2)


def test_pair_features_v1_pp_reachability():
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.features import pair_features_v1
    from nlp_lib_spark.kernels.pipeline import annotate_sentence
    rt = FIXTURE_CONFIG.build()
    ann = annotate_sentence(rt, "interaction of the TagA with the GerE .")
    g = DepGraph(ann["edges"])
    e1 = ann["blinded"].index("PROTEIN0")
    e2 = ann["blinded"].index("PROTEIN1")
    fmap = dict(f.split("=", 1) for f in pair_features_v1(
        ann["blinded"], ann["pos"], ann["domain"], g, e1, e2))
    # both entities reach the DOMAIN noun 'interaction' via prep_of/prep_with
    assert fmap["PP"] == "DOMAIN"
    assert fmap["PP_PAT"].startswith("NN&")
    assert fmap["PREP_PATH"] != ""


def test_grid_search_c_picks_separating_c():
    from nlp_lib_spark.operators.evaluate import grid_search_c
    # separable toy task: feature 'go' => positive
    x = [["go", f"n{i%3}"] if i % 2 else [f"n{i%3}"] for i in range(60)]
    y = [1 if i % 2 else 0 for i in range(60)]
    c = grid_search_c(x, y, n_folds=5, start=-5, end=5, step=2)
    assert c in {2.0 ** i for i in range(-5, 6, 2)}
    # deterministic
    assert c == grid_search_c(x, y, n_folds=5, start=-5, end=5, step=2)


def test_fisher_yates_and_seeded_shuffle(spark):
    from nlp_lib_spark.operators.evaluate import fisher_yates, seeded_shuffle
    items = [f"d{i}" for i in range(20)]
    a = fisher_yates(items, seed=7)
    b = fisher_yates(items, seed=7)
    c = fisher_yates(items, seed=8)
    assert a == b and sorted(a) == sorted(items) and a != items and a != c
    df = spark.createDataFrame([(i,) for i in range(50)], "id int")
    o1 = [r.id for r in seeded_shuffle(df, seed=3).collect()]
    o2 = [r.id for r in seeded_shuffle(df, seed=3).collect()]
    assert o1 == o2 and sorted(o1) == list(range(50)) and o1 != list(range(50))
