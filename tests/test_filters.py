"""Instance filters (ppi/filter/*.java ports), DomainTermRanker, and the
faithful RelCandidateExtractor semantics."""

from __future__ import annotations

import pytest

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.filters import (apply_standard_filters,
                                           domain_filter, juxtapos_filter,
                                           left_pattern_filter,
                                           middle_pattern_filter,
                                           negative_filter, path_filter,
                                           relation_type_filter,
                                           right_pattern_filter)
from nlp_lib_spark.kernels.kernelscore import (backbone_domain_terms,
                                               relation_instance,
                                               set_ranked_key_term)

# PROTEIN1 activates PROTEIN2 : nsubj(1,0), dobj(1,2)
T1 = ["PROTEIN1", "activates", "PROTEIN2"]
P1 = ["NN", "VBZ", "NN"]
D1 = [None, "activate", None]
G1 = DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)])


def _inst(tokens=T1, pos=P1, dom=D1, g=G1, e1=0, e2=2):
    return relation_instance(tokens, pos, dom, g, e1, e2)


def test_path_and_negative_filters():
    inst = _inst()
    assert path_filter(inst)
    assert negative_filter(inst, G1)
    # add a neg edge governed by the backbone verb
    g2 = DepGraph([("nsubj", 1, 0), ("dobj", 1, 2), ("neg", 1, 3)])
    toks = T1 + ["not"]
    inst2 = _inst(toks, P1 + ["RB"], D1 + [None], g2)
    assert not negative_filter(inst2, g2)


def test_juxtapos_filter():
    # non-self pairs always pass
    assert juxtapos_filter(_inst())
    # self pair: keep only when LCS is a noun right of the entity
    toks = ["PROTEIN1/PROTEIN2", "complex"]
    g = DepGraph([("nn", 1, 0)])
    inst = relation_instance(toks, ["NN", "NN"], [None, None], g, 0, 0)
    assert inst["lcs"] == 1 and inst["lcs"] > 0
    assert juxtapos_filter(inst)
    # verbal LCS -> dropped
    inst_v = relation_instance(toks, ["NN", "VBZ"], [None, None], g, 0, 0)
    assert not juxtapos_filter(inst_v)


def test_domain_filter():
    assert domain_filter(_inst(), G1)  # DOMAIN on the backbone verb
    # no DOMAIN anywhere -> dropped
    inst = _inst(dom=[None, None, None])
    assert not domain_filter(inst, G1)
    # DOMAIN on a dependent of a backbone node -> kept (java:60-67)
    g = DepGraph([("nsubj", 1, 0), ("dobj", 1, 2), ("advmod", 1, 3)])
    toks = T1 + ["together"]
    inst2 = _inst(toks, P1 + ["RB"], [None, None, None, "interact"], g)
    assert domain_filter(inst2, g)


def test_middle_pattern_filter():
    assert middle_pattern_filter(_inst())  # plain nsubj/dobj backbone
    # clausal edge on a MIDDLE backbone -> dropped
    toks = ["PROTEIN1", "suggests", "binds", "PROTEIN2"]
    pos = ["NN", "VBZ", "VBZ", "NN"]
    dom = [None, None, "bind", None]
    g = DepGraph([("nsubj", 1, 0), ("ccomp", 1, 2), ("dobj", 2, 3)])
    inst = relation_instance(toks, pos, dom, g, 0, 3)
    assert inst["e1"] < inst["lcs"] < inst["e2"]
    assert not middle_pattern_filter(inst)


def test_left_pattern_filter():
    # LEFT instance with prep edges survives
    toks = ["interaction", "of", "PROTEIN1", "and", "PROTEIN2"]
    pos = ["NN", "IN", "NN", "CC", "NN"]
    dom = ["interaction", None, None, None, None]
    g = DepGraph([("prep_of", 0, 2), ("prep_with", 0, 4)])
    inst = relation_instance(toks, pos, dom, g, 2, 4)
    assert inst["type"] == "LEFT"
    assert left_pattern_filter(inst)
    # LEFT instance with no prep/agent edges -> dropped
    g2 = DepGraph([("dobj", 0, 2), ("conj_and", 0, 4)])
    inst2 = relation_instance(toks, pos, dom, g2, 2, 4)
    if inst2["lcs"] < inst2["e1"] and inst2["path"]:
        assert not left_pattern_filter(inst2)


def test_right_pattern_filter():
    # RIGHT-type nominal LCS passes regardless
    toks = ["PROTEIN1", "and", "PROTEIN2", "interaction"]
    pos = ["NN", "CC", "NN", "NN"]
    dom = [None, None, None, "interaction"]
    g = DepGraph([("nn", 3, 0), ("nn", 3, 2)])
    inst = relation_instance(toks, pos, dom, g, 0, 2)
    assert inst["type"] == "RIGHT"
    assert right_pattern_filter(inst, g)


def test_relation_type_filter_and_chain():
    inst = _inst()
    assert relation_type_filter(inst, "MIDDLE")
    assert not relation_type_filter(inst, "LEFT")
    assert apply_standard_filters(inst, G1)


def test_backbone_domain_terms_and_ranked_key():
    inst = _inst()
    assert backbone_domain_terms(inst) == ["activate"]
    # ranked key term: verb stratum first, max rank wins
    out = set_ranked_key_term(dict(inst), {"activate": 0.9})
    assert out["key"] == 1 and out["lcs"] == 1
    # unknown terms rank 0 but a sole verb candidate still wins
    out2 = set_ranked_key_term(dict(inst), {})
    assert out2["key"] == 1


def test_rank_domain_terms_aggregation(spark):
    """Distributed (pos-neg)/(pos+neg) matches DomainTermRanker.rank."""
    from pyspark.sql import Row

    from nlp_lib_spark.operators.kernel_score import rank_domain_terms

    rows = [Row(terms=["activate", "bind"], interaction=True),
            Row(terms=["activate"], interaction=True),
            Row(terms=["activate", "bind"], interaction=False),
            Row(terms=["inhibit"], interaction=False)]
    df = spark.createDataFrame(rows)
    got = {r.term: r.rank for r in rank_domain_terms(df).collect()}
    # activate: pos=2 neg=1 -> 1/3 ; bind: pos=1 neg=1 -> 0
    # inhibit: never positive -> absent (posMap-keyed loop, java:52-56)
    assert got["activate"] == pytest.approx(1 / 3)
    assert got["bind"] == pytest.approx(0.0)
    assert "inhibit" not in got


def test_rel_candidates_rcmod_seed_and_negation():
    from nlp_lib_spark.kernels.rules import rel_candidates

    # nsubj seed, negated governor -> no candidates (java:63-64)
    toks = ["PROTEIN1", "does", "not", "activate", "PROTEIN2"]
    pos = ["NN", "VBZ", "RB", "VB", "NN"]
    dom = [None, None, None, "activate", None]
    edges = [("nsubj", 3, 0), ("aux", 3, 1), ("neg", 3, 2), ("dobj", 3, 4)]
    assert rel_candidates(toks, pos, dom, edges) == set()
    # same without negation -> the pair survives via form1
    edges2 = [("nsubj", 3, 0), ("dobj", 3, 4)]
    toks2 = ["PROTEIN1", "can", "always", "activate", "PROTEIN2"]
    assert (0, 4) in rel_candidates(toks2, pos, dom, edges2)
