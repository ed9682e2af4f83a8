"""Legacy LLL Relex (relx/Relex.java) — goldens + verbatim-transliteration fuzz.

The fuzz oracle below is a deliberate line-by-line Python transliteration of
the public reference Java (relx/Relex.java:58-567), kept naive (linear edge
scans, recursion shaped like the Java) and independent of the kernel under
test except for the shared input layers. It applies the same two documented
totalizations as the kernel (O-chunk singleton spans; flat-NP stand-in for
the parse-tree NP-ancestor walk) so the fuzz isolates the rule logic:
DFS visited sharing, claim ordering, passive flips, dedup quirks.
"""

from __future__ import annotations

import random
import re

from nlp_lib_spark.kernels.bio import chunk_bio
from nlp_lib_spark.kernels.depparse import dep_parse
from nlp_lib_spark.kernels.lexann import LexSynAnnotator
from nlp_lib_spark.kernels.lll_relex import (LLLSent, chunk_span, explore,
                                             filter_type1, filter_type2,
                                             filter_type3, lex_chunk,
                                             lll_interactions,
                                             resolve_surface,
                                             type1_relations, type2_relations,
                                             type3_relations)
from nlp_lib_spark.kernels.postag import pos_tag


# --------------------------------------------------------------------------
# Verbatim transliteration (fuzz oracle)
# --------------------------------------------------------------------------
class _JavaRelex:
    """Line-by-line transliteration of relx/Relex.java (see module doc)."""

    P1 = re.compile(
        r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\s(via|after|with|if|once|requires"
        r"|require|when|through|due to|in case|provided that|effect of|result of"
        r"|member of|in response to|in (the)? control of"
        r"|under (the)? control of|depend(s|ed|ent)? ([a-z]+)? on).*")
    P2 = re.compile(r".*(requires|require|depend(s|ed|ent)? on).*")
    P3 = re.compile(r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\sby.*")
    P4 = re.compile(
        r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\sby.*(time|times|fold|(ing<<VB)).*")

    def __init__(self, tokens, pos, chunk, lexe, edges, restriction):
        self.t, self.p, self.c, self.l = tokens, pos, chunk, lexe
        self.edges = list(edges)  # (reln, gov, dep) in insertion order
        self.restriction = restriction
        self.n = len(tokens)

    # ---- SimpleDepGraph linear scans ----
    def gov_deps(self, i):
        return [e for e in self.edges if e[1] == i]

    def deps_matching(self, pat):
        return [e for e in self.edges if re.fullmatch(pat, e[0])]

    # ---- ling/Chunk.java:56-84 (totalized as in the kernel) ----
    def chunk(self, middle):
        if self.c[middle] == "O":
            return middle, middle
        start = middle
        while start >= 0 and not self.c[start].startswith("B-"):
            start -= 1
        if start < 0:
            start = 0
        end = middle + 1
        while end < self.n and not (self.c[end].startswith("B-")
                                    or self.c[end] == "O"):
            end += 1
        return start, end - 1

    # ---- java:58-104 ----
    def get_type1(self):
        relations = []
        for subj_dep in self.deps_matching(r"nsubj|nsubjpass"):
            visited = [False] * self.n
            self._explore1(subj_dep[1], [subj_dep], relations, visited)
        return relations

    def _explore1(self, i, tmp, relations, visited):
        if visited[i]:
            return
        visited[i] = True
        if re.fullmatch(r".*NP", self.c[i]):
            relations.append(list(tmp))
        for dep in self.gov_deps(i):
            if not re.fullmatch(
                    r"(nsubj|nsubjpass|xsubj|conj.*|nn|amod|advmod|det)",
                    dep[0]):
                tmp.append(dep)
                self._explore1(dep[2], tmp, relations, visited)
                tmp.pop()

    # ---- java:106-145 ----
    def get_type2(self):
        relations = []
        visited = [False] * self.n
        for s_dep in self.edges:
            if re.fullmatch(r"prep.(of|by|to|on|for|in|through|with)",
                            s_dep[0]) and not visited[s_dep[1]] \
                    and re.fullmatch(r".*NP", self.c[s_dep[1]]):
                relation = []
                self._explore2(s_dep, relation, visited)
                if relation:
                    relations.append(relation)
                    for sd in relation:
                        visited[sd[1]] = True
                        visited[sd[2]] = True
        return relations

    def _explore2(self, s_dep, relation, visited):
        dep = s_dep[2]
        if not visited[dep] and re.fullmatch(r".*NP", self.c[dep]):
            relation.append(s_dep)
            for nxt in self.gov_deps(dep):
                if re.fullmatch(r"prep_(of|by|to|on|for|in|through|with)",
                                nxt[0]):
                    self._explore2(nxt, relation, visited)

    # ---- java:147-170 ----
    def get_type3(self):
        between = [None] * self.n
        for s_dep in self.deps_matching(r"prep_between"):
            if between[s_dep[1]] is None:
                between[s_dep[1]] = []
            between[s_dep[1]].append(s_dep)
        return [b for b in between if b is not None]

    # ---- java:493-502 ----
    def explore(self, start, pat, visited, reachable):
        visited[start] = True
        reachable.append(start)
        for s_dep in self.gov_deps(start):
            if not visited[s_dep[2]] and re.fullmatch(pat, s_dep[0]):
                self.explore(s_dep[2], pat, visited, reachable)

    # ---- java:171-232 ----
    def correct_order(self, relation):
        if len(relation) > 1 and relation[0][0] == "nsubjpass":
            lo, hi = self.chunk(relation[0][1])
            for i in range(lo, hi + 1):
                if self.t[i].lower() in self.restriction:
                    return False
        sb = ""
        for i, (reln, gov, dep) in enumerate(relation):
            if i == 0:
                lo, hi = self.chunk(dep)
                for j in range(lo, hi + 1):
                    sb += " " + self.t[j]
                    if re.fullmatch(r"(VB|NN|JJ).*", self.p[j]):
                        sb += "<<" + self.p[j]
                continue
            lo, hi = self.chunk(gov)
            for j in range(lo, hi + 1):
                sb += " " + self.t[j]
                if re.fullmatch(r"(VB|NN|JJ).*", self.p[j]) and \
                        not re.fullmatch(
                            r"requires?|effect|provided|effect|result|member"
                            r"|response|control|depend(s|ed|ent)?", self.t[j]):
                    sb += "<<" + self.p[j]
            if reln.startswith("prep_"):
                sb += " " + reln[5:]
        if self.P1.fullmatch(sb) or self.P2.fullmatch(sb):
            return False
        if self.P3.fullmatch(sb) and not self.P4.fullmatch(sb):
            return False
        return True

    # ---- java:233-274 (flat-NP totalization) ----
    def is_domain_specific(self, relation):
        for i, (reln, gov, dep) in enumerate(relation):
            lo, hi = self.chunk(gov)
            for j in range(lo, hi + 1):
                for tok in self.t[j].split("-"):
                    if tok.lower() in self.restriction:
                        return True
            if i == 0 and re.fullmatch(r".*NP", self.c[dep]):
                lo, hi = self.chunk(dep)
                for j in range(lo, hi + 1):
                    if self.t[j].lower() in self.restriction:
                        return True
        return False

    # ---- java:276-391 ----
    def filter_type1(self, relations):
        interactions = []
        for relation in relations:
            if not self.is_domain_specific(relation):
                continue
            first = relation[0]
            agent = first[2] if re.fullmatch(r"nsubj.*", first[0]) else first[1]
            if self.l[agent] != "B":
                reachable = []
                self.explore(agent,
                             r"partmod|dobj|appos|prep.*|amod|nn|advmod"
                             r"|conj.*|dep", [False] * self.n, reachable)
                for i in reachable:
                    if self.l[i] == "B":
                        agent = i
                        break
            if self.l[agent] == "I":
                lo, hi = self.chunk(agent)
                for i in range(lo, hi + 1):
                    if self.l[i] == "B":
                        agent = i
                        break
            target = relation[-1][2]
            if self.l[target] != "B":
                reachable = []
                self.explore(target, r"nn|amod|advmod",
                             [False] * self.n, reachable)
                for i in reachable:
                    if self.l[i] == "B":
                        target = i
                        break
            if self.l[target] == "I":
                lo, hi = self.chunk(target)
                for i in range(lo, hi + 1):
                    if self.l[i] == "B":
                        target = i
                        break
            if self.l[target] == "B" and self.l[agent] == "B":
                if not self.correct_order(relation):
                    agent, target = target, agent
                interactions.append((agent, target))
        unique = []
        duplicate = [False] * len(interactions)
        for i in range(len(interactions)):
            if not duplicate[i]:
                for j in range(i + 1, len(interactions)):
                    if interactions[i][0] == interactions[j][0] and \
                            interactions[i][1] == interactions[j][1]:
                        duplicate[j] = True
                    elif interactions[i][0] == interactions[j][1] and \
                            interactions[i][1] == interactions[j][0]:
                        if interactions[j][0] < interactions[j][1]:
                            duplicate[j] = True
                        else:
                            continue
                unique.append(interactions[i])
        return unique

    # ---- java:393-431 ----
    def filter_type2(self, relations):
        interactions = []
        for relation in relations:
            for (reln, gov, dep) in relation:
                reachable = []
                self.explore(gov, r"amod|nn|advmod|conj.*",
                             [False] * self.n, reachable)
                agents = [i for i in reachable if self.l[i] == "B"]
                reachable = []
                self.explore(dep, r"amod|nn|advmod|conj.*",
                             [False] * self.n, reachable)
                targets = [i for i in reachable if self.l[i] == "B"]
                for i in agents:
                    for j in targets:
                        interactions.append((i, j))
        return interactions

    # ---- java:433-492 ----
    def filter_type3(self, relations):
        interactions = []
        for relation in relations:
            deps = []
            gov = -1
            for s_dep in relation:
                dep = s_dep[2]
                gov = s_dep[1]
                reachable = []
                self.explore(dep, r"amod|nn|advmod|prep.*",
                             [False] * self.n, reachable)
                for i in reachable:
                    if self.l[i] == "B":
                        deps.append(i)
                        break
            lo, hi = self.chunk(gov)
            domain_specific = False
            for i in range(lo, hi + 1):
                if self.t[i].lower() in self.restriction:
                    domain_specific = True
                    break
            if not domain_specific:
                continue
            for i in range(len(deps)):
                for j in range(i + 1, len(deps)):
                    interactions.append((deps[i], deps[j]))
            if len(deps) == 1:
                dep = deps[0]
                for s_dep in self.gov_deps(dep):
                    if re.fullmatch(r"conj.*", s_dep[0]):
                        dep2 = s_dep[2]
                        reachable = []
                        self.explore(dep2, r"amod|nn|advmod|prep.*",
                                     [False] * self.n, reachable)
                        for i in reachable:
                            if self.l[i] == "B":
                                interactions.append((dep, dep2))
                                break
        return interactions

    # ---- java:537-567 ----
    def get_interactions(self):
        interactions = []
        interactions += self.filter_type1(self.get_type1())
        interactions += self.filter_type2(self.get_type2())
        interactions += self.filter_type3(self.get_type3())
        unique = []
        duplicate = [False] * len(interactions)
        for i in range(len(interactions)):
            if not duplicate[i] and \
                    interactions[i][0] != interactions[i][1]:
                for j in range(i + 1, len(interactions)):
                    if interactions[i][0] == interactions[j][0] and \
                            interactions[i][1] == interactions[j][1]:
                        duplicate[j] = True
                unique.append(interactions[i])
        return unique


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------
_LEX_LINES = [
    "sigA\tsigmaA",                # canonical + synonym
    "spo0A",
    "kinC",
    "comK protein",                # multi-word entry
    "yfhS-pro",
]
_RESTRICTION = frozenset(
    "transcription expression regulation dependent requires "
    "activates inhibits control".split())


def _layers(tokens):
    lexicon = LexSynAnnotator(_LEX_LINES)
    pos = pos_tag(tokens, frozenset())
    chunk = chunk_bio(pos)
    lexe = lexicon.annotate(tokens)
    edges = dep_parse(tokens, pos)
    return tokens, pos, chunk, lexe, edges


def _both(tokens):
    t, p, c, l, e = _layers(tokens)
    got = lll_interactions(t, p, c, l, e, _RESTRICTION)
    exp = _JavaRelex(t, p, c, l, e, _RESTRICTION).get_interactions()
    return got, exp


# --------------------------------------------------------------------------
# goldens
# --------------------------------------------------------------------------
def test_type1_subject_verb_object():
    toks = "sigA activates the transcription of kinC .".split()
    got, exp = _both(toks)
    assert got == exp
    t, p, c, l, e = _layers(toks)
    # sigA (0) and kinC (5) are lexicon entries; transcription carries a
    # restriction term, so the type1 chain survives domain gating
    assert (0, 5) in got


def test_type2_prep_chain_pairs():
    toks = "expression of sigA depends on kinC levels .".split()
    got, exp = _both(toks)
    assert got == exp


def test_type3_between_fanout():
    toks = ("the regulation between sigA and kinC was strong .").split()
    got, exp = _both(toks)
    assert got == exp


def test_passive_by_flips_order():
    # "<target> is activated by <agent>": passivePattern3 (…<<VB … by …)
    # must flip, yielding (agent-side, subject) order swapped
    toks = "kinC is activated by sigA in transcription assays .".split()
    t, p, c, l, e = _layers(toks)
    s = LLLSent(t, p, c, l)
    import nlp_lib_spark.kernels.depgraph as dg
    rels = type1_relations(s, dg.DepGraph(e))
    pairs = filter_type1(s, dg.DepGraph(e), rels, _RESTRICTION)
    got, exp = _both(toks)
    assert got == exp
    if pairs:  # flipped: agent resolved on the far side
        assert pairs[0][0] > pairs[0][1]


def test_interactions_drop_self_pairs_and_same_direction_dups():
    toks = "sigA regulates sigA and kinC expression .".split()
    got, exp = _both(toks)
    assert got == exp
    assert all(a != b for a, b in got)
    assert len(set(got)) == len(got)


def test_lex_chunk_and_surface_resolution():
    lexicon = LexSynAnnotator(_LEX_LINES)
    tokens = "the comK protein binds yfhS-pro today".split()
    lexe = lexicon.annotate(tokens)
    assert lex_chunk(tokens, lexe, 2) == "comK protein"
    assert lex_chunk(tokens, lexe, 0) is None
    # synonym mapping: sigmaA -> sigA (first column wins)
    assert resolve_surface("sigmaA", lexicon) == "sigA"
    # unknown hyphenated surface strips from the last hyphen
    assert resolve_surface("kinC-dependent", lexicon) == "kinC"


def test_chunk_span_totalization():
    # O position -> singleton; I- run without B- clamps to 0
    assert chunk_span(["O", "B-NP", "I-NP"], 0) == (0, 0)
    assert chunk_span(["I-NP", "I-NP", "O"], 1) == (0, 1)
    assert chunk_span(["B-NP", "I-NP", "O"], 1) == (0, 1)


def test_explore_preorder_first_b_wins():
    # explore() must return DFS preorder with edge-insertion priority:
    # first LEXE-B reachable is chosen, not the nearest
    from nlp_lib_spark.kernels.depgraph import DepGraph
    edges = [("nn", 0, 1), ("amod", 0, 2)]
    order = explore(DepGraph(edges), 0, r"nn|amod", 3)
    assert order == [0, 1, 2]


# --------------------------------------------------------------------------
# seeded fuzz vs the transliteration
# --------------------------------------------------------------------------
def test_lll_relex_matches_verbatim_transliteration():
    rng = random.Random(1117)
    vocab = ["sigA", "sigmaA", "spo0A", "kinC", "comK", "protein",
             "transcription", "expression", "regulation", "activates",
             "inhibits", "requires", "depends", "is", "was", "activated",
             "regulated", "by", "of", "on", "between", "with", "in",
             "and", "or", "the", "a", "not", "strongly", "gene", "assay",
             "yfhS-pro", "level", ",", ".", "factor", "control"]
    for trial in range(600):
        n = rng.randint(3, 16)
        toks = [rng.choice(vocab) for _ in range(n)]
        t, p, c, l, e = _layers(toks)
        got = lll_interactions(t, p, c, l, e, _RESTRICTION)
        exp = _JavaRelex(t, p, c, l, e, _RESTRICTION).get_interactions()
        assert got == exp, (trial, toks, got, exp)


def test_lll_relation_finders_match_transliteration():
    """Type finders compared structurally (paths, not just pairs)."""
    from nlp_lib_spark.kernels.depgraph import DepGraph
    rng = random.Random(2229)
    vocab = ["sigA", "kinC", "spo0A", "transcription", "activates",
             "requires", "by", "of", "on", "between", "in", "and",
             "the", "gene", "expression", "." ]
    for _ in range(400):
        n = rng.randint(3, 14)
        toks = [rng.choice(vocab) for _ in range(n)]
        t, p, c, l, e = _layers(toks)
        s = LLLSent(t, p, c, l)
        g = DepGraph(e)
        jr = _JavaRelex(t, p, c, l, e, _RESTRICTION)
        assert type1_relations(s, g) == jr.get_type1()
        assert type2_relations(s, g) == jr.get_type2()
        assert type3_relations(s, g) == jr.get_type3()


def test_extract_triples_lll_matches_kernel(spark):
    """The distributed operator equals the per-turn Python kernel on the
    gate corpus (distribution adds nothing: one fused mapInPandas pass)."""
    import os
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        import pytest
        pytest.skip("testdata not present")
    from nlp_lib_spark.gate import lll_config
    from nlp_lib_spark.operators.lll import extract_triples_lll, lll_turn
    from nlp_lib_spark.operators.transcripts import transcripts
    cfg = lll_config()
    t = transcripts(spark, sf_dir, with_ts=False)
    got = {tuple(r) for r in extract_triples_lll(t, cfg).collect()}
    rt = cfg.build()
    want = set()
    for row in t.select("conv_id", "turn_idx", "text").collect():
        if not row.text:
            continue
        for (sid, a, tg, sj, pr, ob) in lll_turn(rt, row.text):
            want.add((row.conv_id, row.turn_idx, sid, a, tg, sj, pr, ob))
    assert got == want and len(got) > 0


def test_extract_triples_lll_ml_matches_kernel(spark):
    """The distributed MERelex operator equals the per-sentence kernel
    scoring path (distribution invariance for the ML-scored LLL gate)."""
    import os
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        import pytest
        pytest.skip("testdata not present")
    from nlp_lib_spark.gate import lll_config
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.depparse import dep_parse
    from nlp_lib_spark.kernels.lll_relex import lex_chunk, resolve_surface
    from nlp_lib_spark.kernels.postag import pos_tag
    from nlp_lib_spark.kernels.relex_pipe import relex_features
    from nlp_lib_spark.kernels.scoring import load_model, score
    from nlp_lib_spark.kernels.text import (split_sentences, strip_citations,
                                            tokenize)
    from nlp_lib_spark.operators.lll import (DEFAULT_LLL_ML_MODEL_PATH,
                                             extract_triples_lll_ml)
    from nlp_lib_spark.operators.transcripts import transcripts
    cfg = lll_config()
    weights, bias = load_model(DEFAULT_LLL_ML_MODEL_PATH)
    t = transcripts(spark, sf_dir, with_ts=False)
    got = {tuple(r) for r in
           extract_triples_lll_ml(t, cfg, weights, bias).collect()}
    rt = cfg.build()
    want = set()
    for row in t.select("conv_id", "turn_idx", "text").collect():
        if not row.text:
            continue
        for sid, sent in enumerate(split_sentences(strip_citations(row.text))):
            tokens = tokenize(sent)
            if not tokens or len(tokens) > rt.max_sent_tokens:
                continue
            lexe = rt.lexicon.annotate(tokens)
            bs = [i for i, tg in enumerate(lexe) if tg == "B"]
            if len(bs) < 2:
                continue
            pos = pos_tag(tokens, rt.verb_stems)
            g = DepGraph(dep_parse(tokens, pos))
            for ai, i in enumerate(bs):
                for j in bs[ai + 1:]:
                    p = score(relex_features(tokens, g, i, j), weights, bias)
                    if p <= 0.5:
                        continue
                    si = lex_chunk(tokens, lexe, i)
                    sj = lex_chunk(tokens, lexe, j)
                    if si is None or sj is None:
                        continue
                    want.add((row.conv_id, row.turn_idx, sid, i, j,
                              resolve_surface(si, rt.lexicon),
                              "genic_interaction",
                              resolve_surface(sj, rt.lexicon),
                              round(p * 10000)))
    assert got == want and len(got) > 0


def test_extract_triples_relx_matches_kernel(spark):
    """ExtendedRelex distributed operator == per-sentence kernel union."""
    import os
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        import pytest
        pytest.skip("testdata not present")
    from nlp_lib_spark.gate import lll_config
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.depparse import dep_parse
    from nlp_lib_spark.kernels.lll_relex import lex_chunk
    from nlp_lib_spark.kernels.postag import pos_tag
    from nlp_lib_spark.kernels.relex_pipe import extended_relex_interactions
    from nlp_lib_spark.kernels.relx_rules import XSent
    from nlp_lib_spark.kernels.text import (split_sentences, strip_citations,
                                            tokenize)
    from nlp_lib_spark.operators.lll import _relx_surface, extract_triples_relx
    from nlp_lib_spark.operators.transcripts import transcripts
    cfg = lll_config()
    t = transcripts(spark, sf_dir, with_ts=False)
    got = {tuple(r) for r in extract_triples_relx(t, cfg).collect()}
    rt = cfg.build()
    want = set()
    for row in t.select("conv_id", "turn_idx", "text").collect():
        if not row.text:
            continue
        for sid, sent in enumerate(split_sentences(strip_citations(row.text))):
            tokens = tokenize(sent)
            if not tokens or len(tokens) > rt.max_sent_tokens:
                continue
            lexe = rt.lexicon.annotate(tokens)
            pos = pos_tag(tokens, rt.verb_stems)
            g = DepGraph(dep_parse(tokens, pos))
            s = XSent(tokens, pos, lexe)
            for (a, tg) in extended_relex_interactions(s, g, rt.restriction):
                sa = lex_chunk(tokens, lexe, a)
                st = lex_chunk(tokens, lexe, tg)
                if sa is None or st is None:
                    continue
                want.add((row.conv_id, row.turn_idx, sid, a, tg,
                          _relx_surface(sa, rt.lexicon),
                          "genic_interaction",
                          _relx_surface(st, rt.lexicon)))
    assert got == want and len(got) > 0
