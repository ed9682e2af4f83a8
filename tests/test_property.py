"""Hypothesis property tests for the pure-Python kernels (no Spark)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nlp_lib_spark.kernels.bio import decode_bio
from nlp_lib_spark.kernels.blind import blind
from nlp_lib_spark.kernels.clauses import clause_spans
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.gazetteer import Gazetteer
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.simplify import simplify
from nlp_lib_spark.kernels.stem import stem
from nlp_lib_spark.kernels.text import split_sentences, tokenize

WORDS = st.sampled_from(
    ["the", "a", "spark", "hash", "join", "table", "scan", "binds", "to",
     "interacts", "with", "(", ")", ".", ",", "because", "however", "p53",
     "raf", "kinase", "not", "and", "x-y", "a/b"])
TOKEN_LISTS = st.lists(WORDS, min_size=0, max_size=30)

GAZ = Gazetteer(["spark", "hash join", "raf kinase", "p53", "a", "b"])


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" abcdehijk.!?()[]/-'", max_size=120))
def test_sentences_cover_nonspace(text):
    sents = split_sentences(text)
    # every non-space, non-terminal char is preserved in order (runs made
    # only of .!? are dropped by design — matching the SQL-oracle regex)
    def clean(s: str) -> str:
        return "".join(c for c in s if not c.isspace() and c not in ".!?")
    assert "".join(clean(s) for s in sents) == clean(text)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" abcde0-/'().", max_size=80))
def test_tokenize_preserves_nonspace(text):
    toks = tokenize(text)
    assert "".join(toks) == "".join(text.split())


@settings(max_examples=300, deadline=None)
@given(TOKEN_LISTS)
def test_gazetteer_shape_and_membership(tokens):
    tags = GAZ.tag_iob(tokens)
    assert len(tags) == len(tokens)
    for i, t in enumerate(tags):
        if t == "B-PROTEIN":
            assert tokens[i].lower() in GAZ.prefix_set
        if t == "I-PROTEIN":
            assert i > 0 and tags[i - 1] in ("B-PROTEIN", "I-PROTEIN")


@settings(max_examples=300, deadline=None)
@given(TOKEN_LISTS)
def test_blind_reconstruction(tokens):
    tags = GAZ.tag_iob(tokens)
    blinded, mapping, count = blind(tokens, tags)
    # every mapping surface is a space-join of contiguous input tokens
    src = " ".join(tokens)
    for surface in mapping.values():
        assert surface in src
    n_b = sum(1 for t in tags if t in ("B-PROTEIN",))
    n_fused = sum(len(tokens[i].split("/")) for i, t in enumerate(tags)
                  if t == "B-FUSED")
    assert count == n_b + n_fused
    assert len(mapping) == count


@settings(max_examples=300, deadline=None)
@given(TOKEN_LISTS)
def test_simplify_subsequence(tokens):
    out = simplify(tokens)
    it = iter(tokens)
    assert all(any(tok == x for x in it) for tok in out)  # subsequence


@settings(max_examples=300, deadline=None)
@given(TOKEN_LISTS.filter(lambda t: len(t) > 0))
def test_clause_spans_partition(tokens):
    pos = pos_tag(tokens)
    spans = clause_spans(tokens, pos)
    assert spans[0][0] == 0
    assert spans[-1][1] == len(tokens) - 1
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 + 1 == s2  # contiguous, non-overlapping


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 14), st.integers(0, 14)),
                max_size=25))
def test_depgraph_path_symmetry(pairs):
    edges = [("r", a, b) for a, b in pairs if a != b]
    g = DepGraph(edges)
    for (a, b) in pairs[:5]:
        p1 = g.path_labels(a, b)
        p2 = g.path_labels(b, a)
        assert (p1 is None) == (p2 is None)
        if p1 is not None:
            assert len(p1) == len(p2)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefgrstion", min_size=1, max_size=20))
def test_stem_contracts(w):
    s = stem(w)
    assert len(s) <= len(w)
    assert s == s.lower()
    assert w.lower().startswith(s) or s == w.lower()


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(["O", "B-NP", "I-NP", "B-VP", "I-VP"]),
                max_size=25))
def test_decode_bio_wellformed(tags):
    spans = decode_bio(tags)
    covered = set()
    for (s, e, typ) in spans:
        assert 0 <= s <= e < len(tags)
        assert typ in ("NP", "VP")
        for k in range(s, e + 1):
            assert k not in covered  # non-overlapping
            covered.add(k)
    # every tagged position is covered
    for i, t in enumerate(tags):
        if t != "O":
            assert i in covered


# ---- kernel-scoring invariants (kernels/kernelscore, kernels/bio) ----

_EDGE_LISTS = st.lists(
    st.tuples(st.sampled_from(["nsubj", "dobj", "prep_of", "nn", "amod",
                               "conj_and", "rcmod"]),
              st.integers(0, 7), st.integers(0, 7))
    .filter(lambda e: e[1] != e[2]),
    max_size=10)


@given(_EDGE_LISTS, st.integers(0, 7), st.integers(0, 7))
@settings(max_examples=60, deadline=None)
def test_kernel_self_score_and_symmetry(edges, e1, e2):
    from nlp_lib_spark.kernels.kernelscore import (lcs_dep_path_kernel,
                                                   relation_instance,
                                                   simple_feature_kernel)
    n = 8
    tokens = [f"PROTEIN{i}" if i in (e1, e2) else f"w{i}" for i in range(n)]
    pos = ["NN"] * n
    dom = [None] * n
    g = DepGraph(edges)
    inst = relation_instance(tokens, pos, dom, g, e1, e2)
    # self LCS-DP score is exactly 1 whenever a usable backbone exists
    k = lcs_dep_path_kernel(inst, inst)
    if inst["path"] is not None and len(inst["path"]) >= 3:
        assert abs(k - 1.0) < 1e-9
    else:
        assert k == 0.0
    # feature-kernel self score: each non-empty cosine contributes 1
    sk = simple_feature_kernel(inst, inst)
    assert 0.0 <= sk <= 3.0 + 1e-9


@given(st.lists(st.sampled_from(["NN", "NNS", "VBZ", "VB", "RB", "DT",
                                 "JJ", "IN", ",", "MD", "CD"]),
                max_size=20))
@settings(max_examples=80, deadline=None)
def test_chunk_bio_well_formed(pos):
    from nlp_lib_spark.kernels.bio import chunk_bio, decode_bio
    tags = chunk_bio(pos)
    assert len(tags) == len(pos)
    # well-formed BIO: I- only continues an adjacent same-type tag
    for i, t in enumerate(tags):
        if t.startswith("I-"):
            assert i > 0 and tags[i - 1] in ("B-" + t[2:], "I-" + t[2:])
    # decode produces disjoint, ordered, in-bounds spans
    spans = decode_bio(tags)
    last_end = -1
    for (s, e, typ) in spans:
        assert last_end < s <= e < len(pos)
        last_end = e


@given(st.lists(st.sampled_from(["gene", "sigma", "factor", "x-like",
                                 "and", "binds"]), max_size=12))
@settings(max_examples=60, deadline=None)
def test_lexann_spans_in_bounds(tokens):
    from nlp_lib_spark.kernels.lexann import LexAnnotator
    lex = LexAnnotator(["sigma factor", "gene"])
    tags = lex.annotate(tokens)
    assert len(tags) == len(tokens)
    for i, t in enumerate(tags):
        assert t in ("B", "I", "O")
        if t == "I":
            assert i > 0 and tags[i - 1] in ("B", "I")


# ---------------------------------------------------------------- LLL family
_LLL_RELNS = st.sampled_from(
    ["nsubj", "nsubjpass", "dobj", "nn", "amod", "advmod", "det", "neg",
     "prep_of", "prep_by", "prep_with", "prep_between", "conj_and",
     "conj_or", "num"])


def _lll_layers(tokens):
    from nlp_lib_spark.kernels.bio import chunk_bio
    from nlp_lib_spark.kernels.depparse import dep_parse
    from nlp_lib_spark.kernels.lexann import LexSynAnnotator
    lex = LexSynAnnotator(["spark", "hash join", "p53", "raf kinase",
                           "join\tmerge"])
    pos = pos_tag(tokens, frozenset(("bind", "interact")))
    return pos, chunk_bio(pos), lex.annotate(tokens), dep_parse(tokens, pos), lex


@settings(max_examples=150, deadline=None)
@given(TOKEN_LISTS.filter(lambda t: len(t) >= 2))
def test_lll_interactions_invariants(tokens):
    """Every emitted LLL pair stays in bounds, never self-pairs, and both
    ends resolve through lex_chunk to dictionary-derived surfaces."""
    from nlp_lib_spark.kernels.lll_relex import (lex_chunk, lll_interactions,
                                                 resolve_surface)
    pos, chunk, lexe, edges, lex = _lll_layers(tokens)
    restriction = frozenset(("binds", "interacts", "interaction"))
    pairs = lll_interactions(tokens, pos, chunk, lexe, edges, restriction)
    assert len(pairs) == len(set(pairs))  # union dedup holds
    for (a, t) in pairs:
        assert 0 <= a < len(tokens) and 0 <= t < len(tokens)
        assert a != t  # self-pairs dropped by the union
        for e in (a, t):
            sfc = lex_chunk(tokens, lexe, e)
            if sfc is not None:
                resolved = resolve_surface(sfc, lex)
                assert isinstance(resolved, str) and resolved


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_LLL_RELNS,
                          st.integers(0, 9), st.integers(0, 9)),
                min_size=0, max_size=18))
def test_relx_rules_bounds_and_determinism(raw_edges):
    """relx Rule1/2/4 never emit out-of-range pairs and are deterministic
    over arbitrary (possibly cyclic, multi-edge) graphs."""
    from nlp_lib_spark.kernels.relx_rules import (XSent, relx_rule1,
                                                  relx_rule2, relx_rule4)
    n = 10
    edges = [e for e in raw_edges if e[1] != e[2]]
    tokens = ["w%d" % i for i in range(n)]
    pos = ["NN" if i % 3 else "VBZ" for i in range(n)]
    lexe = ["B" if i % 2 else "O" for i in range(n)]
    s = XSent(tokens, pos, lexe)
    g = DepGraph(edges)
    restriction = frozenset(("w1", "w4"))
    r1 = relx_rule1(s, g, restriction)
    r2 = relx_rule2(s, g, restriction)
    r4 = relx_rule4(s, g)
    assert r1 == relx_rule1(s, g, restriction)
    assert r2 == relx_rule2(s, g, restriction)
    for (a, b) in r1 + r2 + r4:
        assert 0 <= a < n and 0 <= b < n


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_LLL_RELNS,
                          st.integers(0, 7), st.integers(0, 7)),
                min_size=0, max_size=14),
       st.integers(0, 7), st.integers(0, 7))
def test_relex_features_total_and_deterministic(raw_edges, e1, e2):
    """The RelexPipe feature map is total (no exceptions) on arbitrary
    graphs including cycles, deterministic, and every feature is K=V."""
    from nlp_lib_spark.kernels.relex_pipe import relex_features
    n = 8
    edges = [e for e in raw_edges if e[1] != e[2]]
    tokens = ["w%d" % i for i in range(n)]
    g = DepGraph(edges)
    f1 = relex_features(tokens, g, e1, e2)
    assert f1 == relex_features(tokens, g, e1, e2)
    assert all("=" in f for f in f1)
    assert any(f.startswith("LCS=") for f in f1)
    assert any(f.startswith("PP=") for f in f1)


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_sst_dyadic_vs_float_random_depth3_trees(data):
    """Random depth-3 constit-shaped trees: the exact dyadic SST kernel
    and the float runtime agree to relative 1e-9 (and bit-exactly while
    the float stays inside the 53-bit mantissa) — the invariant that
    lets kg_sst_scores certify the Collins-Duffy kernel the float path
    computes."""
    from nlp_lib_spark.kernels.tree import parse_penn
    from nlp_lib_spark.kernels.treekernel import (tree_kernel,
                                                  tree_kernel_dyadic)

    labels = ["NP", "VP"]
    poss = ["NN", "VBZ", "DT", "JJ"]
    words = ["aa", "bb", "cc", "dd", "ee"]

    def rand_tree():
        n = data.draw(st.integers(1, 5))
        parts = []
        for _ in range(n):
            if data.draw(st.booleans()):
                k = data.draw(st.integers(1, 3))
                kids = " ".join(
                    f"({data.draw(st.sampled_from(poss))} "
                    f"{data.draw(st.sampled_from(words))})"
                    for _ in range(k))
                parts.append(
                    f"({data.draw(st.sampled_from(labels))} {kids})")
            else:
                parts.append(f"({data.draw(st.sampled_from(poss))} "
                             f"{data.draw(st.sampled_from(words))})")
        return parse_penn("(S " + " ".join(parts) + ")")

    t1, t2 = rand_tree(), rand_tree()
    exact = tree_kernel_dyadic(t1, t2)
    approx = tree_kernel(t1, t2)
    assert abs(approx - float(exact)) <= 1e-9 * max(1.0, float(exact))
