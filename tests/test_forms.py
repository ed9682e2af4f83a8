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


def test_rule2b_matches_verbatim_reference_scan():
    """Seeded fuzz: the cached-base rule2b equals a verbatim port of
    RelexRule2b.getSentPattern + findRelations (java:21-63, note the
    commented-out '.' separator — the class string is concatenated)."""
    import random

    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import (_R2B_PREP_WORDS, _R2B_RE, Sent,
                                             rule2b)

    def naive_pattern(s, e1, e2):
        parts = []
        for i in range(e2 + 1):
            tok = s.tokens[i]
            if i == e1:
                parts.append("PROT1")
            elif i == e2:
                parts.append("PROT2")
            elif "PROTEIN" in tok:
                parts.append("PROT")
            elif s.domain[i] is not None:
                parts.append("REL")
            elif len(tok) == 1 and tok in "/,-":
                parts.append(tok)
            elif s.pos[i] in ("IN", "TO") and tok in _R2B_PREP_WORDS:
                parts.append("PREP")
            elif tok in ("and", "or"):
                parts.append("CONJ")
            elif s.pos[i].startswith("N"):
                parts.append("N")
            else:
                parts.append("W")
        return "".join(parts)

    rng = random.Random(7)
    vocab = ["PROTEIN0", "PROTEIN1", "PROTEIN2", "binds", "with", "of",
             "and", "/", ",", "-", "the", "run", "data", "quickly"]
    pos_of = {"PROTEIN0": "NN", "PROTEIN1": "NN", "PROTEIN2": "NN",
              "binds": "VBZ", "with": "IN", "of": "IN", "and": "CC",
              "/": "/", ",": ",", "-": "-", "the": "DT", "run": "NN",
              "data": "NNS", "quickly": "RB"}
    for _ in range(800):
        n = rng.randint(2, 14)
        toks = [rng.choice(vocab) for _ in range(n)]
        pos = [pos_of[t] for t in toks]
        dom = ["bind" if t == "binds" else None for t in toks]
        s = Sent(toks, pos, dom)
        got = rule2b(s, DepGraph([]))
        exp = {(i, j)
               for i in range(n) if "PROTEIN" in toks[i]
               for j in range(i + 1, n) if "PROTEIN" in toks[j]
               and _R2B_RE.search(naive_pattern(Sent(toks, pos, dom), i, j))}
        assert got == exp, (toks, got, exp)
