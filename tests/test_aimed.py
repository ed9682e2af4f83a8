"""AIMed feature pipe (relx/RelexPipeAIMed.java port): goldens, the
unmarked-queue BFS path/index contract, and family edge cases."""

from __future__ import annotations

import random
import re
from collections import deque

from nlp_lib_spark.kernels.aimed import (aimed_features,
                                         entity_head_position,
                                         is_domain_term, path_with_indices)
from nlp_lib_spark.kernels.constit import build_tree
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.depparse import dep_parse
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.tree import parse_penn


def _java_path_with_indices(edges, src, dst):
    """Independent transliteration of SimpleDepGraph.getPathAsList +
    getPathAsIndexList (java:420-481, 548-614) using the reference's
    adjacency MATRIX + ascending index sweep, as a fuzz oracle for the
    kernel's sorted-adjacency implementation."""
    size = 0
    for (_r, g, d) in edges:
        size = max(size, g, d)
    if src > size or dst > size or src < 0 or dst < 0:
        return None
    size += 1
    graph = [[None] * size for _ in range(size)]
    for (r, g, d) in edges:
        graph[g][d] = r
        graph[d][g] = "-" + r
    parent = [0] * size
    visited = [False] * size
    q = deque([src])
    while q:
        v = q.popleft()
        if visited[v]:
            continue
        visited[v] = True
        if v == dst:
            break
        for i in range(size):
            if not visited[i] and (graph[v][i] is not None
                                   or graph[i][v] is not None):
                parent[i] = v + 1
                q.append(i)
    if parent[dst] == 0:
        return None
    labels, indices = [], []
    v = dst
    while v != src:
        p = parent[v] - 1
        rel = graph[p][v]
        labels.append(rel)
        if rel.startswith("-"):
            indices.append(p if re.fullmatch(r"-(rcmod|partmod|dobj)", rel)
                           else v)
        else:
            indices.append(v if re.fullmatch(r"rcmod|partmod|dobj", rel)
                           else p)
        v = p
    labels.reverse()
    indices.reverse()
    return labels, indices


def test_path_with_indices_fuzz_vs_matrix_transliteration():
    relns = ["nsubj", "dobj", "prep_of", "nn", "amod", "rcmod", "partmod",
             "conj_and", "appos"]
    for seed in (11, 404, 777, 9001):
        rng = random.Random(seed)
        for _ in range(150):
            n = rng.randint(2, 9)
            m = rng.randint(1, 12)
            edges = [(rng.choice(relns), rng.randrange(n), rng.randrange(n))
                     for _ in range(m)]
            g = DepGraph(edges)
            src, dst = rng.randrange(n), rng.randrange(n)
            assert path_with_indices(g, src, dst) == \
                _java_path_with_indices(edges, src, dst), (seed, edges,
                                                           src, dst)


def test_entity_head_position_climb_and_cycle():
    # PROTEIN1 <-nn- complex : head climbs the nn governor
    g = DepGraph([("nn", 2, 0)])
    assert entity_head_position(g, 3, 0, "det|nn|amod|abbrev|num|conj") == 2
    # cycle: a <-nn- b <-nn- a  => falls back to the ORIGINAL entity
    g2 = DepGraph([("nn", 1, 0), ("nn", 0, 1)])
    assert entity_head_position(g2, 2, 0, "det|nn|amod|abbrev|num|conj") == 0
    # non-matching relation: stays put
    g3 = DepGraph([("dobj", 2, 0)])
    assert entity_head_position(g3, 3, 0, "det|nn") == 0


def test_aimed_features_golden():
    toks = ("PROTEIN1 strongly activates PROTEIN2 through the receptor "
            "of PROTEIN3").split()
    pos = pos_tag(toks)
    g = DepGraph(dep_parse(toks, pos))
    tree = parse_penn(build_tree(toks, pos))
    got = aimed_features(toks, pos, g, tree, 3, 8)
    assert got[:5] == ["LCS=PROTEIN2", "LCS_POS=NN", "ROOT1=PROTEIN2",
                       "P1=NONE", "P2=receptor-prep_of"]
    assert "CPATH=prep_through:prep_of:" in got
    assert "LEN=2" in got
    assert "PP_PATH=false" in got        # prep_X doesn't match bare prep
    assert "SUBS=through:of:" in got and "CSUBS=-of" in got
    # 'act' precedes 'activat' in the restriction array: first match wins
    got2 = aimed_features(toks, pos, g, tree, 0, 3)
    assert "DOMAIN=act" in got2 and "DOMAIN=true" in got2
    assert "DOMAIN=false" in got        # PROTEIN2..PROTEIN3 span: no term


def test_aimed_disconnected_pair_skips_rule1():
    toks = "PROTEIN1 and PROTEIN2".split()
    pos = pos_tag(toks)
    g = DepGraph([])  # no edges at all
    tree = parse_penn(build_tree(toks, pos))
    got = aimed_features(toks, pos, g, tree, 0, 2)
    # rule1/PP_PATH need a path; baseline + rule2 + surface + syntactic run
    assert "LCS=NONE" in got and "PP=NONE" in got
    assert not any(f.startswith(("CPATH", "LEN", "SBJ", "RCMOD", "PP_PATH"))
                   for f in got)
    assert any(f.startswith("HEAD=") for f in got)


def test_aimed_conj_feature_and_pp_chain():
    # pure conj path: PROTEIN1 -conj-> PROTEIN2 (non-collapsed label, the
    # deps AIMed reads come from gs.typedDependencies()), subject via nsubj
    toks = "PROTEIN1 and PROTEIN2 bind".split()
    pos = pos_tag(toks)
    edges = [("conj", 0, 2), ("nsubj", 3, 0)]
    g = DepGraph(edges)
    tree = parse_penn(build_tree(toks, pos))
    got = aimed_features(toks, pos, g, tree, 0, 2)
    assert "CONJ=bind" in got            # gov of the nsubj edge
    # conj is pruned from the collapsed path -> Java List.toString fallback
    assert "CPATH=[conj]" in got
    # PP chain: common prep ancestor via prep_* edges from both entities
    toks2 = "binding of PROTEIN1 to PROTEIN2 occurs".split()
    pos2 = pos_tag(toks2)
    edges2 = [("prep_of", 0, 2), ("prep_to", 0, 4)]
    g2 = DepGraph(edges2)
    tree2 = parse_penn(build_tree(toks2, pos2))
    got2 = aimed_features(toks2, pos2, g2, tree2, 2, 4)
    assert "PP=binding" in got2
    # no pobj on either chain -> Java null-concat renders "null"
    assert any(f.startswith("PP=") and f.endswith("&null&null")
               for f in got2)


def test_is_domain_term():
    assert is_domain_term("Activates") and is_domain_term("bind")
    assert not is_domain_term("PROTEIN1") and not is_domain_term("receptor")


def test_aimed_maxent_heldout(spark):
    """Held-out P/R of the AIMed MaxEnt path (MERelexAIMed slot) — the
    committed model must generalize past its training seed, and scoring
    must be partition-deterministic."""
    import pandas as pd

    from nlp_lib_spark.fixtures import FIXTURE_CONFIG, generate_transcripts
    from nlp_lib_spark.operators.ml import extract_triples_aimed
    from nlp_lib_spark.resources import load_packaged_model

    weights, bias = load_packaged_model("aimed_me.json")
    turns, gold = generate_transcripts(n_convs=40, seed=99)
    tdf = spark.createDataFrame(pd.DataFrame(
        turns, columns=["conv_id", "turn_idx", "role", "text", "tool",
                        "ts_epoch"]))
    out = extract_triples_aimed(tdf, FIXTURE_CONFIG, weights, bias)
    a = out.toPandas()
    pred = {(r.conv_id, r.turn_idx, r.sent_id, r.subj.lower(), r.obj.lower())
            for r in a.itertuples()}
    goldset = {(c, t, s, subj, obj) for (c, t, s, subj, _p, obj) in gold}
    tp = len(pred & goldset)
    precision = tp / max(1, len(pred))
    recall = tp / max(1, len(goldset))
    assert precision >= 0.95, (precision, sorted(pred - goldset)[:5])
    # RelexPipeAIMed enumerates DISTINCT-token pairs only (java:46-61;
    # AIMed never fuses mentions), so gold pairs inside fused-mention
    # sentences (18/159 at this seed = 11.3%) are structurally out of
    # scope — recall bound sits just under the 0.8868 reachable ceiling
    assert recall >= 0.85, (recall, sorted(goldset - pred)[:5])
    b = extract_triples_aimed(tdf.repartition(5), FIXTURE_CONFIG,
                              weights, bias).toPandas()
    key = ["conv_id", "turn_idx", "sent_id", "e1", "e2"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
