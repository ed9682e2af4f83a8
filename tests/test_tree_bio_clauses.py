"""Golden tests: BIO decode, Penn-tree utilities, clause spans, dep LCS, LLL."""

from __future__ import annotations

from nlp_lib_spark.kernels.bio import decode_bio
from nlp_lib_spark.kernels.clauses import clause_spans
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.tree import (gorn_address, gorn_node, head_leaf,
                                        label_path, lca, leaf_position,
                                        leaves, parse_penn)

PENN = "(ROOT (S (NP (DT the) (NN dog)) (VP (VBZ chases) (NP (DT a) (NN cat)))))"


def test_decode_bio():
    assert decode_bio(["B-NP", "I-NP", "O", "B-VP"]) == \
        [(0, 1, "NP"), (3, 3, "VP")]
    # lenient orphan I- opens a span (Chunk.java:56-84 behavior)
    assert decode_bio(["I-NP", "O"]) == [(0, 0, "NP")]
    assert decode_bio(["B-NP", "I-VP"]) == [(0, 0, "NP"), (1, 1, "VP")]
    assert decode_bio(["O", "O"]) == []
    assert decode_bio(["B-X", "I-X"]) == [(0, 1, "X")]


def test_parse_penn_and_leaves():
    root = parse_penn(PENN)
    assert root is not None and root.label == "ROOT"
    lv = leaves(root)
    assert [l.word for l in lv] == ["the", "dog", "chases", "a", "cat"]
    assert [l.label for l in lv] == ["DT", "NN", "VBZ", "DT", "NN"]
    # parse-failure marker parses to childless root
    assert parse_penn("(ROOT)").label == "ROOT"
    assert parse_penn("((broken") is None


def test_gorn_round_trip():
    root = parse_penn(PENN)
    for node in leaves(root):
        addr = gorn_address(root, node)
        assert gorn_node(root, addr) is node


def test_lca_and_path():
    root = parse_penn(PENN)
    node = lca(root, 0, 1)
    assert node.label == "NP"
    node2 = lca(root, 1, 4)
    assert node2.label == "S"
    lv = leaves(root)
    path = label_path(root, lv[1], lv[4])
    assert path[0] == "NN" and path[-1] == "NN" and "S" in path


def test_head_rules():
    root = parse_penn(PENN)
    lv = leaves(root)
    # S head -> VP -> chases
    s_node = root.children[0]
    assert head_leaf(s_node).word == "chases"
    np = s_node.children[0]
    assert head_leaf(np).word == "dog"
    assert leaf_position(root, lv[2]) == 2


def test_clause_spans():
    toks = "the deal closed because the price was right .".split()
    pos = pos_tag(toks)
    spans = clause_spans(toks, pos)
    assert spans[0][0] == 0
    assert any(s == 3 for s, _ in spans)  # clause at 'because'
    assert spans[-1][1] == len(toks) - 1
    assert clause_spans([], []) == []
    # bare NP coordination does NOT split
    toks2 = "the cat and the dog slept .".split()
    spans2 = clause_spans(toks2, pos_tag(toks2))
    assert len(spans2) == 1


def test_dep_lcs():
    g = DepGraph([("nsubj", 2, 0), ("dobj", 2, 4), ("det", 4, 3)])
    assert g.lcs(0, 3) == 2
    assert g.lcs(3, 4) == 4
    assert g.lcs(0, 5) == -1


def test_read_lll(spark, tmp_path):
    content = """ID\tabc-1
sentence\tGerE binds to cotD .
words\tword(0,'GerE',0,3)
lemmas\tlemma(0,'gere')
syntactic_relations\trel
genic_interactions\tgenic_interaction(0,3)

% comment
ID\tabc-2
sentence\tnothing here .
words\tw
lemmas\tl
syntactic_relations\tr
genic_interactions\tgenic_interaction(1,2)\tgenic_interaction(2,4)
"""
    p = tmp_path / "lll.txt"
    p.write_text(content)
    from nlp_lib_spark.sources.readers import read_lll
    df = read_lll(spark, str(p)).orderBy("record_id").collect()
    assert len(df) == 2
    assert df[0].record_id == "abc-1"
    assert df[0].interactions == [{"agent": 0, "target": 3}] or \
        [(i.agent, i.target) for i in df[0].interactions] == [(0, 3)]
    assert len(df[1].interactions) == 2


def test_chunk_bio_runs():
    """Shallow chunker: NP over noun-ish runs, VP over verb runs with RB
    continuation, B/I transitions at type changes."""
    from nlp_lib_spark.kernels.bio import chunk_bio, decode_bio
    pos = ["DT", "NN", "VBZ", "RB", "DT", "JJ", "NN", ",", "NN"]
    tags = chunk_bio(pos)
    assert tags == ["B-NP", "I-NP", "B-VP", "I-VP", "B-NP", "I-NP", "I-NP",
                    "O", "B-NP"]
    assert decode_bio(tags) == [(0, 1, "NP"), (2, 3, "VP"), (4, 6, "NP"),
                                (8, 8, "NP")]
    # RB outside an open VP is O; RB before the verb does not open one
    assert chunk_bio(["RB", "VBZ"]) == ["O", "B-VP"]
    assert chunk_bio(["NN", "RB"]) == ["B-NP", "O"]
    assert chunk_bio([]) == []


def test_build_tree_shape_and_escapes():
    """Frozen constit builder: chunk grouping, O singletons, Penn bracket
    escapes in both POS and word positions, and the (S ...) root."""
    from nlp_lib_spark.kernels.constit import build_tree, penn_escape
    toks = ["the", "dog", "runs", "(", "fast", ")", "."]
    pos = ["DT", "NN", "VBZ", "(", "RB", ")", "."]
    t = build_tree(toks, pos)
    assert "(NP (DT the) (NN dog))" in t
    assert "(-LRB- -LRB-)" in t and "(-RRB- -RRB-)" in t
    assert "(" * 0 + penn_escape("[x]") == "-LSB-x-RSB-"
    assert t.startswith("(S ") and t.endswith("(. .))")


def test_build_tree_parse_roundtrip():
    """build_tree output reparses loss-free through parse_penn: the
    leaf sequence reproduces the escaped tokens in order."""
    from nlp_lib_spark.kernels.constit import build_tree, penn_escape
    from nlp_lib_spark.kernels.tree import leaves, parse_penn
    toks = ["a", "hash", "join", "binds", "to", "[", "12", "]", "."]
    pos = ["DT", "NN", "NN", "VBZ", "TO", "[", "CD", "]", "."]
    root = parse_penn(build_tree(toks, pos))
    assert root is not None and root.label == "S"
    assert [n.word for n in leaves(root)] == [penn_escape(w) for w in toks]


def test_subtree_kernel_closed_form():
    """ST kernel equals the depth-3 closed form the SQL oracle uses:
    leaf-word matches + (POS,word) preterm matches + full-chunk matches
    + root equality."""
    from nlp_lib_spark.kernels.constit import build_tree
    from nlp_lib_spark.kernels.tree import parse_penn
    from nlp_lib_spark.kernels.treekernel import (subtree_kernel,
                                                  subtree_signatures)
    t1 = parse_penn(build_tree(["the", "dog", "runs", "."],
                               ["DT", "NN", "VBZ", "."]))
    t2 = parse_penn(build_tree(["the", "cat", "runs", "."],
                               ["DT", "NN", "VBZ", "."]))
    # identical: every node pairs with itself once per multiset count
    s1 = subtree_signatures(t1)
    assert subtree_kernel(t1, t1) == sum(c * c for c in s1.values())
    # hand count vs t2: words the/runs/. (3) + preterms (DT the),
    # (VBZ runs), (. .) (3) + chunks: NP differs, VP matches (1) + root
    # differs (0)
    assert subtree_kernel(t1, t2) == 3 + 3 + 1
    assert subtree_kernel(t1, t2) == subtree_kernel(t2, t1)


def test_prototype_trees_deterministic():
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    from nlp_lib_spark.operators.trees import prototype_trees
    a = prototype_trees(TESTDATA_CONFIG)
    b = prototype_trees(TESTDATA_CONFIG)
    assert a == b and len(a) == 2
    assert all(p.startswith("(S ") for p in a)


def test_sst_tree_scores_matches_driver_loop(spark):
    """Distributed SST scoring == driver-side tree_kernel loop."""
    import math

    from nlp_lib_spark.kernels.tree import parse_penn
    from nlp_lib_spark.kernels.treekernel import tree_kernel
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    from nlp_lib_spark.operators.extract import annotate_turns
    from nlp_lib_spark.operators.transcripts import transcripts
    from nlp_lib_spark.operators.trees import (prototype_trees,
                                               sst_tree_scores,
                                               trees_from_annotations)

    ann = annotate_turns(transcripts(spark, "/root/testdata/sf0.001",
                                     with_ts=False), TESTDATA_CONFIG)
    trees = trees_from_annotations(ann).limit(40).localCheckpoint()
    protos = prototype_trees(TESTDATA_CONFIG)
    got = {(r.conv_id, r.turn_idx, r.sent_id, r.proto_id): r.k_scaled
           for r in sst_tree_scores(trees, protos).collect()}
    ptrees = [parse_penn(p) for p in protos]
    want = {}
    for r in trees.collect():
        t = parse_penn(r.tree)
        for pid, pt in enumerate(ptrees):
            want[(r.conv_id, r.turn_idx, r.sent_id, pid)] = \
                int(math.floor(10_000 * tree_kernel(t, pt, 0.5)))
    assert got == want and len(got) == 80


# ---- tree -> typed dependencies (the PTB2Dep slot) -------------------------

def test_tree_to_deps_golden_built_tree():
    from nlp_lib_spark.kernels.constit import build_tree
    from nlp_lib_spark.kernels.treedep import tree_to_deps
    toks = "the PROTEIN1 strongly activates PROTEIN2 in the cell".split()
    root = parse_penn(build_tree(toks, pos_tag(toks)))
    deps = tree_to_deps(root)
    # S head: Collins S-rule prefers IN ("in", idx 5); NP heads attach by
    # side (nsubj left / obj right); group internals to group heads.
    assert deps == [("root", -1, 5), ("nsubj", 5, 1), ("advmod", 5, 2),
                    ("nsubj", 5, 4), ("obj", 5, 7), ("det", 1, 0),
                    ("compound", 4, 3), ("det", 7, 6)]


def test_tree_to_deps_gold_tree_and_properties():
    from nlp_lib_spark.kernels.treedep import tree_to_deps
    root = parse_penn(PENN)  # nested gold tree (ROOT (S (NP..) (VP.. (NP..))))
    deps = tree_to_deps(root)
    # every leaf governed exactly once; exactly one root edge
    governed = sorted(d for _, _, d in deps)
    assert governed == list(range(len(leaves(root))))
    assert sum(1 for r, g, _ in deps if r == "root" and g == -1) == 1
    # VP head 'chases' is sentence head; subject NP head 'dog' left -> nsubj
    assert ("nsubj", 2, 1) in deps and ("obj", 2, 4) in deps
    assert ("det", 1, 0) in deps and ("det", 4, 3) in deps


def test_tree_to_deps_empty_and_malformed():
    from nlp_lib_spark.kernels.treedep import tree_to_deps
    assert tree_to_deps(parse_penn("(S )")) == []
    assert tree_to_deps(None) == []


def test_dep_line_round_trip():
    """format_dep_line output parses back through sources/readers.parse_dep
    byte-for-byte (the PTB2Dep.java file payload round trip)."""
    from nlp_lib_spark.kernels.constit import build_tree
    from nlp_lib_spark.kernels.treedep import format_dep_line, tree_to_deps
    from nlp_lib_spark.sources.readers import parse_dep
    toks = "( see Figure 2 ) and results suggest the receptor".split()
    root = parse_penn(build_tree(toks, pos_tag(toks)))
    deps = tree_to_deps(root)
    words = [l.word for l in leaves(root)]
    line = format_dep_line(deps, words)
    parsed = [parse_dep(raw) for raw in line.split("\t")]
    assert parsed == deps
