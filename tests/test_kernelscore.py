"""Kernel-inspired scoring: backbone paths, LCS DP kernel, feature
kernel, prototype scoring, and the distributed operator.

Golden values are hand-computed from the reference semantics
(libsvm/LCSDepPathKernel.java, ppi/filter/SimpleFeatureKernel.java,
ppi/filter/RelationInstance.java, ppi/filter/CorpusReader.java).
"""

from __future__ import annotations

import math

import pytest

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.kernelscore import (LAMBDA, ancestors,
                                               backbone_path, find_lcs,
                                               find_lcs2, fix_path,
                                               lcs_dep_path_kernel,
                                               lcs_dep_path_score,
                                               prototype_score,
                                               relation_instance,
                                               simple_feature_kernel)
from nlp_lib_spark.kernels.stem import stem


def _ctx(tokens, pos, domain):
    return (tokens, pos, domain)


# PROTEIN1 activates PROTEIN2 : nsubj(1,0), dobj(1,2)
T1 = ["PROTEIN1", "activates", "PROTEIN2"]
P1 = ["NN", "VBZ", "NN"]
D1 = [None, "activate", None]
G1 = DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)])


def test_ancestors_and_lcs():
    assert ancestors(G1, 3, 0) == [1]
    assert ancestors(G1, 3, 2) == [1]
    assert find_lcs(G1, 3, 0, 2) == 1
    # conj skip variant: loop-inducing conj edge ignored
    g = DepGraph([("nsubj", 1, 0), ("conj_and", 0, 1)])
    assert find_lcs(g, 2, 0, 1, skip_conj=True) == -1


def test_backbone_path_lcs_case():
    assert backbone_path(G1, 3, 0, 2) == ["0", "-nsubj", "1", "dobj", "2"]


def test_backbone_path_fallback_direction_quirk():
    # e1 -> e2 straight down a gov chain: no common ancestor distinct
    # from e1, so the undirected fallback runs; first edge is a real
    # gov->dep edge => all labels unsigned (LCSDepPathKernel.java:192-201).
    g = DepGraph([("prep_of", 0, 1), ("nn", 1, 2)])
    assert backbone_path(g, 3, 0, 2) == ["0", "prep_of", "1", "nn", "2"]
    # reversed: from the dep end, first traversed edge is dep->gov =>
    # every label gets the minus sign
    assert backbone_path(g, 3, 2, 0) == ["2", "-nn", "1", "-prep_of", "0"]


def test_self_score_is_one():
    p = backbone_path(G1, 3, 0, 2)
    c = _ctx(T1, P1, D1)
    assert lcs_dep_path_score(p, c, p, c) == pytest.approx(1.0)


def test_length_mismatch_lambda_damping():
    # same middle but a longer second path: one extra (word, reln) hop
    t2 = ["PROTEIN1", "activates", "receptor", "PROTEIN2"]
    p2pos = ["NN", "VBZ", "NN", "NN"]
    d2 = [None, "activate", None, None]
    g2 = DepGraph([("nsubj", 1, 0), ("dobj", 1, 2), ("nn", 2, 3)])
    pa = backbone_path(G1, 3, 0, 2)
    pb = backbone_path(g2, 4, 0, 3)
    assert pb == ["0", "-nsubj", "1", "dobj", "2", "nn", "3"]
    s = lcs_dep_path_score(pa, _ctx(T1, P1, D1), pb, _ctx(t2, p2pos, d2))
    # interior alignment: -nsubj==-nsubj (6) + word 'activates' stem match
    # (3+2+1) => 12; then dobj aligns with dobj (6) => 18;
    # normalized by 6*(min(5,7)-2)=18 => 1.0, damped by 0.8^((7-5)/2)
    assert s == pytest.approx(LAMBDA * 1.0)


def test_relation_family_half_score():
    # -nsubj vs -nsubjpass and prep_of vs prep_by score SCORE_REL/2
    pa = ["0", "-nsubj", "1", "prep_of", "2"]
    pb = ["0", "-nsubjpass", "1", "prep_by", "2"]
    ta = ["PROTEIN1", "binds", "PROTEIN2"]
    tb = ["PROTEIN1", "binds", "PROTEIN2"]
    pos = ["NN", "VBZ", "NN"]
    dom = [None, "bind", None]
    s = lcs_dep_path_score(pa, _ctx(ta, pos, dom), pb, _ctx(tb, pos, dom))
    # interior: 3 + (3+2+1) + 3 = 12 over unit 18
    assert s == pytest.approx(12 / 18)


def test_fix_path_abbrev_trim():
    assert fix_path(["0", "-abbrev", "1", "dobj", "2"]) == ["1", "dobj", "2"]
    assert fix_path(["0", "-nsubj", "1", "abbrev", "2"]) == ["0", "-nsubj", "1"]
    assert fix_path(None) is None


def test_find_lcs2_domain_promotion():
    # LCS (idx 0) left of both entities, non-DOMAIN noun, entities
    # non-DOMAIN; a DOMAIN-tagged governor of the LCS takes over
    # (CorpusReader.java:207-222).
    toks = ["complex", "interaction", "PROTEIN1", "PROTEIN2"]
    pos = ["NN", "NN", "NN", "NN"]
    dom = [None, "interaction", None, None]
    g = DepGraph([("prep_of", 0, 2), ("prep_with", 0, 3),
                  ("nsubj", 1, 0)])
    assert find_lcs(g, 4, 2, 3, skip_conj=True) == 0
    assert find_lcs2(g, 4, 2, 3, pos, dom) == 1


def test_relation_instance_types():
    # MIDDLE: lcs strictly between the entities
    inst = relation_instance(T1, P1, D1, G1, 0, 2)
    assert inst["type"] == "MIDDLE"
    assert inst["lcs"] == 1
    assert inst["lcs_index"] == 2
    assert inst["key"] == 1  # DOMAIN-tagged LCS
    # LEFT: governor chain left of both entities
    toks = ["interaction", "of", "PROTEIN1", "and", "PROTEIN2"]
    pos = ["NN", "IN", "NN", "CC", "NN"]
    dom = ["interaction", None, None, None, None]
    g = DepGraph([("prep_of", 0, 2), ("prep_with", 0, 4)])
    inst2 = relation_instance(toks, pos, dom, g, 2, 4)
    assert inst2["type"] == "LEFT"
    assert inst2["key"] == 0


def test_simple_feature_kernel_gate_and_self():
    inst = relation_instance(T1, P1, D1, G1, 0, 2)
    assert simple_feature_kernel(inst, inst) == pytest.approx(3.0)
    other = relation_instance(
        ["interaction", "of", "PROTEIN1", "and", "PROTEIN2"],
        ["NN", "IN", "NN", "CC", "NN"],
        ["interaction", None, None, None, None],
        DepGraph([("prep_of", 0, 2), ("prep_with", 0, 4)]), 2, 4)
    assert other["type"] == "LEFT"
    assert simple_feature_kernel(inst, other) == 0.0  # type gate


def test_kernel_symmetry():
    t2 = ["PROTEIN1", "inhibits", "PROTEIN2"]
    d2 = [None, "inhibit", None]
    i1 = relation_instance(T1, P1, D1, G1, 0, 2)
    i2 = relation_instance(t2, P1, d2, DepGraph([("nsubj", 1, 0),
                                                 ("dobj", 1, 2)]), 0, 2)
    assert lcs_dep_path_kernel(i1, i2) == pytest.approx(
        lcs_dep_path_kernel(i2, i1))
    assert simple_feature_kernel(i1, i2) == pytest.approx(
        simple_feature_kernel(i2, i1))


def test_prototype_score_max():
    t2 = ["PROTEIN1", "inhibits", "PROTEIN2"]
    d2 = [None, "inhibit", None]
    i1 = relation_instance(T1, P1, D1, G1, 0, 2)
    i2 = relation_instance(t2, P1, d2, DepGraph([("nsubj", 1, 0),
                                                 ("dobj", 1, 2)]), 0, 2)
    s_best = prototype_score(i1, [i2, i1])
    assert s_best == pytest.approx(1.0)  # self-prototype wins the max
    assert prototype_score(i1, []) == 0.0


def test_operator_matches_driver_side(spark):
    """Distributed kernel scoring == single-process scoring (distribution
    invariance, the P/R gate pattern)."""
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    from nlp_lib_spark.operators.kernel_score import (build_prototypes,
                                                      extract_triples_kernel,
                                                      instances_for_sentence)

    protos = build_prototypes(TESTDATA_CONFIG, [
        "the spark activates the table.",
        "a vector binds the stream.",
    ])
    assert protos, "prototype sentences must yield instances"

    rows = [
        ("c1", 0, "the spark activates the table."),
        ("c1", 1, "the weather is nice today."),
        ("c2", 0, "a column regulates the row and the stream."),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "text string")
    got = extract_triples_kernel(df, TESTDATA_CONFIG, protos,
                                 threshold=0.3)
    got_rows = {(r.conv_id, r.turn_idx, r.sent_id, r.e1, r.e2,
                 round(r.score, 6)) for r in got.collect()}

    rt = TESTDATA_CONFIG.build()
    from nlp_lib_spark.kernels.text import split_sentences, strip_citations
    exp = set()
    for conv, ti, text in rows:
        for sid, sent in enumerate(split_sentences(strip_citations(text))):
            for ann, _g, inst in instances_for_sentence(rt, sent):
                s = prototype_score(inst, protos, "lcs")
                if s >= 0.3:
                    exp.add((conv, ti, sid, inst["e1"], inst["e2"],
                             round(s, 6)))
    assert got_rows == exp
    assert exp, "planted sentences must produce scored pairs"


def test_tree_kernel_identical_trees():
    """Collins-Duffy SST golden: K of (S (NP a) (VP b)) with itself at
    lambda=0.5 is 2*0.25 (leaves) + 2*0.25*1.25 (preterminals)
    + 0.25*1.3125^2 (root) = 1.5556640625."""
    from nlp_lib_spark.kernels.tree import parse_penn
    from nlp_lib_spark.kernels.treekernel import tree_kernel
    t = parse_penn("(S (NP a) (VP b))")
    assert tree_kernel(t, t) == pytest.approx(1.5556640625)
    # disjoint productions share nothing
    u = parse_penn("(X (Y c) (Z d))")
    assert tree_kernel(t, u) == 0.0


def test_dependency_kernel_golden():
    """Hand-computed: identical 'PROTEIN1 activates PROTEIN2' graphs,
    lcs=1: root word match 1.0 + children walk 1.5 = 2.5."""
    from nlp_lib_spark.kernels.treekernel import dependency_kernel
    g = DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)])
    args = (g, T1, P1, g, T1, P1)
    assert dependency_kernel(*args, 0, 2, 1, 0, 2, 1) == pytest.approx(2.5)
    # position-strata gate: between vs after => 0
    assert dependency_kernel(g, T1, P1, g, T1, P1,
                             0, 2, 1, 0, 1, 2) == 0.0
    # no LCS => 0
    assert dependency_kernel(g, T1, P1, g, T1, P1,
                             0, 2, -1, 0, 2, 1) == 0.0


def test_dependency_kernel_cycle_guard():
    """Cyclic conj edges must not blow the stack (the reference recurses
    unboundedly; we contribute 0 for a re-entered node pair)."""
    from nlp_lib_spark.kernels.treekernel import dependency_kernel
    toks = ["alpha", "beta", "binds"]
    pos = ["NN", "NN", "VBZ"]
    g = DepGraph([("conj_and", 0, 1), ("conj_and", 1, 0), ("nsubj", 2, 0)])
    v = dependency_kernel(g, toks, pos, g, toks, pos, 0, 1, 0, 0, 1, 0)
    assert v == v and v >= 0.0  # finite, no RecursionError


def test_kernel_path_scores_fused_self_pairs():
    """Fused same-token candidates enter the kernel path so the
    Juxtapos filter has something to act on."""
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    from nlp_lib_spark.operators.kernel_score import instances_for_sentence
    rt = TESTDATA_CONFIG.build()
    found = []
    for _ann, _g, inst in instances_for_sentence(
            rt, "the spark/table interaction regulates the row."):
        found.append((inst["e1"], inst["e2"]))
    assert any(i == j for (i, j) in found), found


def test_kernel_path_resolves_fused_surfaces():
    """Review regression: a non-self pair whose side is a fused token
    must resolve per-part surfaces, never leak PROTEINk placeholders."""
    from nlp_lib_spark.kernels.pipeline import resolve_surface
    m = {"PROTEIN0": "spark", "PROTEIN1": "table", "PROTEIN2": "row"}
    assert resolve_surface(m, "PROTEIN2") == "row"
    assert resolve_surface(m, "PROTEIN0/PROTEIN1") == "spark/table"
    assert resolve_surface(m, "PROTEIN9") == "PROTEIN9"  # unknown passthrough


# --------------------------- SimpleKernel / EditDistance / global context
def _mk_inst(rt, sentence, which=(0, 1)):
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.kernelscore import relation_instance
    from nlp_lib_spark.kernels.pipeline import annotate_sentence
    ann = annotate_sentence(rt, sentence)
    g = DepGraph(ann["edges"])
    prot = [i for i, t in enumerate(ann["blinded"]) if "PROTEIN" in t]
    dom = [d if d else None for d in ann["domain"]]
    return relation_instance(ann["blinded"], ann["pos"], dom, g,
                             prot[which[0]], prot[which[1]])


def test_simple_kernel_identity_and_type_gate():
    from nlp_lib_spark.fixtures import FIXTURE_CONFIG
    from nlp_lib_spark.kernels.kernelscore import simple_kernel
    rt = FIXTURE_CONFIG.build()
    a = _mk_inst(rt, "the TagA activates the GerE .")
    b = _mk_inst(rt, "the p53 inhibits the cdk2 .")
    # self-similarity: three perfectly-overlapping normalized dots = 3
    assert simple_kernel(a, a) == 3.0
    s = simple_kernel(a, b)
    assert 0.0 < s < 3.0
    assert simple_kernel(a, b) == simple_kernel(b, a)
    gated = dict(b)
    gated["type"] = "LEFT" if b["type"] != "LEFT" else "RIGHT"
    assert simple_kernel(a, gated) == 0.0


def test_edit_distance_kernel_goldens():
    import math

    from nlp_lib_spark.fixtures import FIXTURE_CONFIG
    from nlp_lib_spark.kernels.kernelscore import edit_distance_kernel
    rt = FIXTURE_CONFIG.build()
    a = _mk_inst(rt, "the TagA activates the GerE .")
    b = _mk_inst(rt, "the p53 inhibits the cdk2 .")
    # identical structure: zero edits in every segment -> exp(0)*3
    assert edit_distance_kernel(a, a) == 3.0
    # same backbone shape, different protein ids match as PROTEIN,
    # activ/inhibit stems differ but both are DOMAIN verbs (POS V match)
    assert edit_distance_kernel(a, b) == 3.0
    c = _mk_inst(rt, "TagB binds p21 and also regulates MyoD , p53 .",
                 which=(0, 1))
    v = edit_distance_kernel(a, c)
    assert 0.0 < v <= 3.0 and v == edit_distance_kernel(c, a)
    assert math.isclose(edit_distance_kernel(c, c), 3.0)


def test_global_context_kernel_windows():
    from nlp_lib_spark.fixtures import FIXTURE_CONFIG
    from nlp_lib_spark.kernels.kernelscore import global_context_kernel
    rt = FIXTURE_CONFIG.build()
    a = _mk_inst(rt, "the TagA strongly activates the GerE today .")
    b = _mk_inst(rt, "the p53 strongly activates the cdk2 today .")
    s = global_context_kernel(a, b)
    # identical contexts: between + after windows cosine 1 each; the fore
    # window holds only 'the' (non-content POS) so it contributes 0
    assert s == 2.0
    d = _mk_inst(rt, "a p53 weakly inhibits a cdk2 now .")
    assert 0.0 <= global_context_kernel(a, d) < 3.0


def test_simple_kernel2_self_and_gate():
    """RBF self-distance is 0 => score 1; type gate zeroes mixed pairs
    (SimpleKernel2.java:50-63)."""
    from nlp_lib_spark.kernels.kernelscore import simple_kernel2
    i1 = relation_instance(T1, P1, D1, G1, 0, 2)
    assert simple_kernel2(i1, i1) == pytest.approx(1.0)
    toks = ["the", "activation", "of", "PROTEIN1", "by", "PROTEIN2"]
    pos = ["DT", "NN", "IN", "NN", "IN", "NN"]
    dom = [None, "activation", None, None, None, None]
    g = DepGraph([("prep_of", 1, 3), ("prep_by", 1, 5)])
    left = relation_instance(toks, pos, dom, g, 3, 5)
    assert left["type"] != i1["type"]
    assert simple_kernel2(i1, left) == 0.0
    # the verb lemma sits AT the LCS path slot, which the half windows
    # exclude and the lcsIndex-as-sentence-index quirk replaces with
    # tokens[2] — so a same-shape verb swap scores exactly 1.0 (faithful)
    t2 = ["PROTEIN1", "binds", "PROTEIN2"]
    d2 = [None, "bind", None]
    i2 = relation_instance(t2, P1, d2,
                           DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)]),
                           0, 2)
    assert simple_kernel2(i1, i2) == pytest.approx(1.0)
    # a structurally different right half (prep reln) separates the vectors
    t3 = ["PROTEIN1", "interacts", "with", "PROTEIN2"]
    p3 = ["NN", "VBZ", "IN", "NN"]
    d3 = [None, "interact", None, None]
    i3 = relation_instance(t3, p3, d3,
                           DepGraph([("nsubj", 1, 0), ("prep_with", 1, 3)]),
                           0, 3)
    assert simple_kernel2(i1, i3) == pytest.approx(simple_kernel2(i3, i1))
    assert 0.0 < simple_kernel2(i1, i3) < 1.0


def test_dep_walk_kernel_golden():
    """Hand-computed self walk on the T1 backbone: entity-word 3 + reln 6
    + lemma 1 = 10 for both aligned windows, max kept (DepWalkKernel.java:
    44-77)."""
    from nlp_lib_spark.kernels.kernelscore import dep_walk_kernel
    i1 = relation_instance(T1, P1, D1, G1, 0, 2)
    assert dep_walk_kernel(i1, i1) == pytest.approx(10.0)
    # q_max=3: suffix walk adds word+reln at the head: 3 + 6 on top of the
    # k-1 tail score 10 => scores[3] = 19, total 10 + 19
    assert dep_walk_kernel(i1, i1, q_max=3) == pytest.approx(29.0)
    t2 = ["PROTEIN1", "binds", "PROTEIN2"]
    d2 = [None, "bind", None]
    i2 = relation_instance(t2, P1, d2,
                           DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)]),
                           0, 2)
    # lemma mismatch at the verb: 3 + 6 + 0 vs 0 + 6 + 3 => max 9
    assert dep_walk_kernel(i1, i2) == pytest.approx(9.0)


def test_feature_kernel_self_and_symmetry():
    from nlp_lib_spark.kernels.kernelscore import feature_kernel
    i1 = relation_instance(T1, P1, D1, G1, 0, 2)
    assert feature_kernel(i1, i1) == pytest.approx(2.0)
    t2 = ["PROTEIN1", "binds", "PROTEIN2"]
    d2 = [None, "bind", None]
    i2 = relation_instance(t2, P1, d2,
                           DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)]),
                           0, 2)
    assert feature_kernel(i1, i2) == pytest.approx(feature_kernel(i2, i1))
    assert 0.0 < feature_kernel(i1, i2) < 2.0


def test_path_structure_kernel_golden():
    """Perfect self-alignment normalizes each half to exactly 1.0, so the
    self score is 1*1 + |domset| cosine = 2.0 (PathStructureKernel.java:
    32-42, 63-114)."""
    from nlp_lib_spark.kernels.kernelscore import path_structure_kernel
    i1 = relation_instance(T1, P1, D1, G1, 0, 2)
    assert path_structure_kernel(i1, i1) == pytest.approx(2.0)
    t2 = ["PROTEIN1", "binds", "PROTEIN2"]
    d2 = [None, "bind", None]
    i2 = relation_instance(t2, P1, d2,
                           DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)]),
                           0, 2)
    s12 = path_structure_kernel(i1, i2)
    assert s12 == pytest.approx(path_structure_kernel(i2, i1))
    # identical POS paths align perfectly; dom sets differ by lemma only
    assert s12 < 2.0


def test_similarity_kernel_windows():
    """Between-window DOMAIN lemmas bridge through the similarity table;
    sub-0.4 scores are floored (SimilarityKernel.java:45-100)."""
    from nlp_lib_spark.kernels.kernelscore import similarity_kernel
    i1 = relation_instance(T1, P1, D1, G1, 0, 2)
    t2 = ["PROTEIN1", "binds", "PROTEIN2"]
    d2 = [None, "bind", None]
    i2 = relation_instance(t2, P1, d2,
                           DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)]),
                           0, 2)
    a, b = sorted((stem("activates").lower(), stem("binds").lower()))
    assert similarity_kernel(i1, i2, {(a, b): 0.9}) == pytest.approx(0.9)
    # floor: below-threshold similarity contributes nothing
    assert similarity_kernel(i1, i2, {(a, b): 0.3}) == 0.0
    # self: identical lemma keys
    s = stem("activates").lower()
    assert similarity_kernel(i1, i1, {(s, s): 1.0}) == pytest.approx(1.0)


def test_connective_tk_generator_golden():
    """Hand-worked SVM-light-TK line (ConnectiveTreeKernel.java:73-153):
    sentence-initial gold connective -> NONEL placeholder, unary ADVP
    climb, comma right-sibling simplification, window features in
    first-seen index order."""
    from nlp_lib_spark.kernels.conn_treekernel import ConnectiveTKGenerator
    gen = ConnectiveTKGenerator({"however", "and"})
    tree = ("(ROOT (S (ADVP (RB However)) (, ,) (NP (DT the) (NN query)) "
            "(VP (VBZ runs))))")
    lines = gen.instances(["However", ",", "the", "query", "runs"],
                          ["B-CONN", "O", "O", "O", "O"], tree)
    assert lines == [
        "+1 \t|BT| (S (NONEL XL) (ADVP (RB however)) (, ,)) "
        "|BT| (S (ADVP (RB however)) (, ,)) "
        "|BT| (S (NONEL XL) (ADVP (RB however))) |ET| "
        "1:1 2:0.7 3:0.6 |BV| 1:1 2:1 3:1 |BV| 1:1 |BV| 1:0 |BV| "
        "1:1 2:1 3:1 4:1 5:1 |EV|"]
    # a lexicon hit outside gold tags emits a negative instance, and the
    # feature map keeps growing across calls (stateful indices)
    tree2 = "(ROOT (S (NP (NN spark)) (CC and) (NP (NN duck))))"
    lines2 = gen.instances(["spark", "and", "duck"],
                           ["O", "O", "O"], tree2)
    assert len(lines2) == 1 and lines2[0].startswith("-1")
    # stateful grow-only feature map: indices continue past the first call
    assert " 6:1" in lines2[0]


def test_connective_tk_di_skipped():
    from nlp_lib_spark.kernels.conn_treekernel import ConnectiveTKGenerator
    gen = ConnectiveTKGenerator(set())
    tree = "(ROOT (S (IN if) (NN x) (RB then) (NN y)))"
    lines = gen.instances(["if", "x", "then", "y"],
                          ["DB-CONN", "O", "DI-CONN", "O"], tree)
    assert len(lines) == 1 and lines[0].startswith("+1")


def test_sst_dyadic_equals_float_small_trees():
    """On small trees every intermediate fits the 53-bit mantissa, so the
    float kernel and the exact dyadic kernel agree bit-for-bit."""
    from nlp_lib_spark.kernels.tree import parse_penn
    from nlp_lib_spark.kernels.treekernel import (tree_kernel,
                                                  tree_kernel_dyadic)
    a = parse_penn("(S (NP (DT the) (NN cat)) (VP (VBZ sat)) (. .))")
    b = parse_penn("(S (NP (DT the) (NN dog)) (VP (VBZ sat)) (. .))")
    for t1, t2 in ((a, a), (a, b), (b, b)):
        exact = tree_kernel_dyadic(t1, t2)
        assert float(exact) == tree_kernel(t1, t2)


def test_sst_float_matches_dyadic_on_gate_corpus_protos():
    """The float runtime path (sst_tree_scores) is bounded against the
    exact dyadic path on the prototype self/cross kernels — the largest
    values the gate corpus can produce (a sentence identical to a
    prototype)."""
    from nlp_lib_spark.kernels.tree import parse_penn
    from nlp_lib_spark.kernels.treekernel import (tree_kernel,
                                                  tree_kernel_dyadic)
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    from nlp_lib_spark.operators.trees import prototype_trees
    protos = [parse_penn(p) for p in prototype_trees(TESTDATA_CONFIG)]
    for t1 in protos:
        for t2 in protos:
            exact = tree_kernel_dyadic(t1, t2)
            approx = tree_kernel(t1, t2)
            assert abs(approx - float(exact)) <= 1e-9 * max(1.0,
                                                            float(exact))


def test_sst_exact_scores_floor_semantics():
    """floor(scale*K) in integer arithmetic: spot-check against Fraction."""
    from fractions import Fraction

    from nlp_lib_spark.kernels.tree import parse_penn
    from nlp_lib_spark.kernels.treekernel import tree_kernel_dyadic
    t = parse_penn("(S (NP (DT the) (NN cat)) (VP (VBZ sat)) (. .))")
    k = tree_kernel_dyadic(t, t)
    assert isinstance(k, Fraction)
    scaled = (10_000 * k.numerator) // k.denominator
    assert scaled == int(10_000 * k)  # k >= 0 so floor == int-div
