"""RelexPipe / MERelex / ExtendedRelex ports: transliteration fuzz for the
feature pipe, quirk goldens for the gold-word mapping, and an end-to-end
learnability check on LLL-shaped instances."""

from __future__ import annotations

import random
import re
from collections import deque

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.relex_pipe import (extended_relex_interactions,
                                              lll_gold_mapping,
                                              lll_ml_candidates,
                                              relex_features)
from nlp_lib_spark.kernels.relx_rules import XSent


def gov_deps(edges, gov, pat=None):
    return [e for e in edges if e[1] == gov
            and (pat is None or re.fullmatch(pat, e[0]))]


def dep_deps(edges, dep, pat=None):
    return [e for e in edges if e[2] == dep
            and (pat is None or re.fullmatch(pat, e[0]))]


def j_path_as_list(edges, src, dst):
    # verbatim getPathAsList (SimpleDepGraph.java:420-481)
    size = max([max(e[1], e[2]) for e in edges], default=0) + 1
    if src >= size or dst >= size:
        return None
    graph = [[None] * size for _ in range(size)]
    for (reln, gov, dep) in edges:
        graph[gov][dep] = reln
        graph[dep][gov] = "-" + reln
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
            if not visited[i] and graph[v][i] is not None:
                parent[i] = v + 1
                q.append(i)
    if parent[dst] == 0:
        return None
    path = []
    v = dst
    while v != src:
        p = parent[v] - 1
        path.insert(0, graph[p][v])
        v = p
    return path


def j_lcs(edges, a, b):
    # SimpleDepGraph.getLCS (java:639-670): root paths, cycle-guarded
    def root_path(x):
        out = [x]
        seen = {x}
        cur = x
        while True:
            es = dep_deps(edges, cur)
            if not es or es[0][1] in seen:
                break
            cur = es[0][1]
            out.append(cur)
            seen.add(cur)
        return out

    pa = root_path(a)
    pb = root_path(b)
    for x in pa:
        if x in pb:
            return x
    return -1


def j_relex_features(toks, edges):
    """Verbatim RelexPipe.pipe transliteration (RelexPipe.java:40-207)."""
    n = len(toks)

    def entity_head(pos):
        seen = {pos}
        while True:
            es = dep_deps(edges, pos, r"nn|amod")
            if not es or es[0][1] in seen:
                return pos
            pos = es[0][1]
            seen.add(pos)

    def features(e1, e2):
        out = []
        h1, h2 = entity_head(e1), entity_head(e2)
        lcs = j_lcs(edges, h1, h2)
        out.append("LCS=NONE" if lcs == -1 else "LCS=" + toks[lcs])
        labels = j_path_as_list(edges, h1, h2)
        if labels is not None:
            joined = str(labels)
            out.append("SBJ=" + ("TRUE" if "nsubj" in joined else "FALSE"))
            prep_chain = True
            collapsed = ""
            last = ""
            for reln in labels:
                if not re.fullmatch(r"-?(prep|pobj|amod|nn|conj)", reln):
                    prep_chain = False
                if not re.fullmatch(r"-?(pobj|amod|nn|conj)", reln) \
                        and reln != last:
                    collapsed += reln + ":"
                    last = reln
            out.append("CPATH=" + collapsed)
            out.append("PPChain?=" + ("true" if prep_chain else "false"))
            pos = h1
            visited = [False] * n
            while True:
                es = dep_deps(edges, pos)
                if not es:
                    break
                pos = es[0][1]
                if visited[pos]:
                    break
                visited[pos] = True
            out.append("ROOT=" + toks[pos])
            for (tag, h) in (("P1", h1), ("P2", h2)):
                es = dep_deps(edges, h)
                if not es:
                    out.append(tag + "=NONE")
                else:
                    parent = es[0][1]
                    reln = next(r for (r, g, d) in edges
                                if g == parent and d == h)
                    out.append(f"{tag}={toks[parent]}-{reln}")
            for (tag, h) in (("C1", h1), ("C2", h2)):
                for i, (_r, _g, dep) in enumerate(gov_deps(edges, h)[:2]):
                    if dep < n:
                        out.append(f"{tag}{i}={toks[dep]}")
        def pp_reach(start):
            reach = set()
            visited = [False] * n
            q = deque([start])
            while q:
                top = q.popleft()
                if visited[top]:
                    continue
                visited[top] = True
                for (reln, gov, _d) in dep_deps(edges, top):
                    if re.fullmatch(r"nn|amod|appos|prep.*|pobj", reln):
                        q.append(gov)
                        if re.fullmatch(r"prep.*", reln):
                            reach.add(gov)
            return reach
        common = sorted(pp_reach(e1) & pp_reach(e2))
        out.append("PP=" + (toks[common[0]] if common else "NONE"))
        return out

    return features


def test_relex_features_match_transliteration():
    relns = ["nsubj", "nsubjpass", "dobj", "nn", "amod", "appos",
             "conj_and", "prep_of", "prep_by", "pobj", "dep", "partmod"]
    rng = random.Random(97)
    for trial in range(300):
        n = rng.randint(3, 10)
        toks = ["w%d" % i for i in range(n)]
        edges = []
        seen = set()
        for _ in range(rng.randint(1, 2 * n)):
            gv, dp = rng.randrange(n), rng.randrange(n)
            if gv == dp:
                continue
            reln = rng.choice(relns)
            if (reln, gv, dp) in seen:
                continue
            seen.add((reln, gv, dp))
            edges.append((reln, gv, dp))
        g = DepGraph(edges)
        jf = j_relex_features(toks, edges)
        for _ in range(3):
            e1, e2 = rng.randrange(n), rng.randrange(n)
            if e1 == e2:
                continue
            got = relex_features(toks, g, e1, e2)
            want = jf(e1, e2)
            assert got == want, (trial, toks, edges, e1, e2, got, want)


def test_lll_gold_mapping_quirks():
    # exact match advances the cursor by one (not to the match position)
    words = ["sigA", "binds", "kinC"]
    tokens = ["sigA", "binds", "kinC"]
    assert lll_gold_mapping(words, tokens) == {0: 0, 1: 1, 2: 2}
    # hyphen branches: prefix match doesn't advance the cursor, and the
    # suffix branch then re-hits the SAME token for the second word —
    # both gold words land on the fused token (the reference's behavior)
    assert lll_gold_mapping(["yfhS", "pro"], ["yfhS-pro", "x"]) \
        == {0: 0, 1: 0}
    # unmatched words map to -1
    assert lll_gold_mapping(["zzz"], ["a", "b"]) == {0: -1}


def test_lll_ml_candidates_and_extended_relex():
    tokens = ["sigA", "binds", "kinC", "and", "spo0A"]
    lexe = ["B", "O", "B", "O", "B"]
    gold = {(2, 0)}  # direction ignored by the signature
    cands = lll_ml_candidates(tokens, lexe, gold)
    assert (0, 2, True) in cands
    assert (0, 4, False) in cands and (2, 4, False) in cands
    # ExtendedRelex: first-wins dedup over the rule union
    pos = ["NN", "VBZ", "NN", "CC", "NN"]
    s = XSent(tokens, pos, lexe)
    g = DepGraph([("nsubj", 1, 0), ("dobj", 1, 2)])
    out = extended_relex_interactions(s, g, frozenset(("binds",)))
    assert len(out) == len(set(out))


def test_merelex_learnability():
    """MaxEnt over relex_features separates planted positive pairs (the
    MERelex train/eval loop, java:41-62, on a synthetic LLL corpus)."""
    from nlp_lib_spark.kernels.scoring import score, train_logreg
    rng = random.Random(11)
    x, y = [], []
    for _ in range(120):
        pos_case = rng.random() < 0.5
        if pos_case:
            toks = ["geneA", "activates", "geneB", "today"]
            edges = [("nsubj", 1, 0), ("dobj", 1, 2)]
        else:
            toks = ["geneA", "sleeps", "near", "geneB"]
            edges = [("nsubj", 1, 0), ("prep_near", 1, 3)]
        g = DepGraph(edges)
        feats = relex_features(toks, g, 0, 2 if pos_case else 3)
        x.append(feats)
        y.append(1 if pos_case else 0)
    weights, bias = train_logreg(x, y, epochs=40, lr=0.5, seed=3)
    correct = sum(
        1 for feats, label in zip(x, y)
        if (score(feats, weights, bias) > 0.5) == bool(label))
    assert correct / len(x) >= 0.95
