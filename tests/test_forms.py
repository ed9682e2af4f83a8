"""Surface-form typing (RuleExtractor forms 1-5) + RelCandidateExtractor."""

from __future__ import annotations

from nlp_lib_spark.kernels.depparse import dep_parse
from nlp_lib_spark.kernels.domain import DomainAnnotator
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.rules import form_type, rel_candidates
from nlp_lib_spark.kernels.stem import stem


def _setup(toks, terms):
    d = DomainAnnotator(terms)
    pos = pos_tag(toks, frozenset(stem(t) for t in terms))
    dom = d.tag(toks)
    return toks, pos, dom, dep_parse(toks, pos)


def test_form1_verbal_svo():
    t = _setup(["PROTEIN0", "interacts", "with", "PROTEIN1", "."],
               ["interact"])
    assert form_type(*t, 0, 3) == 1


def test_form1_negation_falls_through():
    t = _setup(["PROTEIN0", "does", "not", "interact", "with", "PROTEIN1", "."],
               ["interact"])
    assert form_type(*t, 0, 5) != 1


def test_form3_nominal_prep():
    t = _setup(["interaction", "of", "PROTEIN0", "with", "PROTEIN1", "."],
               ["interaction", "interact"])
    assert form_type(*t, 2, 4) == 3


def test_form4_fused():
    t = _setup(["the", "PROTEIN0/PROTEIN1", "interaction", "."],
               ["interaction", "interact"])
    assert form_type(*t, 1, 1) == 4


def test_form5_trailing_rel():
    t = _setup(["PROTEIN0", "and", "PROTEIN1", "binding", "was", "strong", "."],
               ["bind", "binding"])
    assert form_type(*t, 0, 2) == 5


def test_form_none():
    t = _setup(["PROTEIN0", "near", "PROTEIN1", "."], ["interact"])
    assert form_type(*t, 0, 2) == -1


def test_rel_candidates_subj_seed():
    t = _setup(["PROTEIN0", "interacts", "with", "PROTEIN1", "."],
               ["interact"])
    assert rel_candidates(*t) == {(0, 3)}


def test_rel_candidates_empty_without_seed():
    t = _setup(["of", "PROTEIN0", "PROTEIN1", "."], ["interact"])
    assert rel_candidates(*t) == set()
