"""RelexPipe / MERelex — the ML path of the legacy LLL pipeline.

Ports:

* ``relex_features`` — ``relx/RelexPipe.java:40-210``: the baseline family
  (entity-head climb, LCS word, SBJ flag, collapsed path, PP-chain flag,
  root/parent/child context) plus the cross-entity PP-reachability family
  (``addPPChainFeatures``, java:183-207).  Emitted as ``K=V`` strings for
  the shared broadcast-weights scorer (kernels/scoring).
* ``lll_gold_mapping`` — ``relx/MERelex.getMapping`` (java:117-156): align
  the LLL record's word list onto the pipeline tokenization, including the
  hyphen-prefix/suffix and two-token-merge fallbacks and the reference's
  cursor quirk (``curIndex`` advances by one, not to the match position).
* ``lll_ml_candidates`` — ``relx/MERelex.addThroughPipe`` (java:64-114):
  all ordered LEXE-B pairs (i<j) labeled by the undirected gold signature
  set.
* ``extended_relex_interactions`` — ``relx/ExtendedRelex.getInteractions``
  (java:60-80): the Rule1+Rule2+Rule4 union with first-wins pair dedup.

``RelexPipeAIMed`` / ``RelexPipeAIMedMinipar`` are richer supersets of the
same families re-targeted at AIMed (extra Rule1/Rule2/surface/syntactic
blocks over a hardcoded stem list); one variant is ported per the SURVEY
§2.7 single-variant policy.  The reference's two-graph signature
(typed + CCProcessed) collapses onto the single frozen builder graph,
like every other port in this repo.
"""

from __future__ import annotations

import re

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.rules import _p3_path_labels

Pair = tuple[int, int]

_COLLAPSE_SKIP = re.compile(r"-?(pobj|amod|nn|conj)")
_CHAIN_OK = re.compile(r"-?(prep|pobj|amod|nn|conj)")
_PP_CLIMB = re.compile(r"nn|amod|appos|prep.*|pobj")


def _entity_head(g: DepGraph, pos: int) -> int:
    """getEntityHeadPosition (RelexPipe.java:224-247): climb the first
    incoming nn|amod edge to its governor, recursively.  Cycle-guarded
    (the reference recurses unboundedly; its corpora have no nn/amod
    cycles)."""
    seen = {pos}
    while True:
        es = g.dep_edges(pos, r"nn|amod")
        if not es or es[0][1] in seen:
            return pos
        pos = es[0][1]
        seen.add(pos)


def _first_parent(g: DepGraph, pos: int) -> int:
    es = g.dep_edges(pos)
    return es[0][1] if es else -1


def _dependency_reln(g: DepGraph, gov: int, dep: int) -> str | None:
    # SimpleDepGraph.getDependency (java:281-288): first edge in list order
    for (reln, gv, dp) in g.edges:
        if gv == gov and dp == dep:
            return reln
    return None


def _root_of(g: DepGraph, n: int, pos: int) -> int:
    # RelexPipe.getRoot (java:212-222): climb first incoming governor;
    # visited marked after moving (the reference's exact loop)
    visited = [False] * max(n, 1)
    while True:
        es = g.dep_edges(pos)
        if not es:
            break
        pos = es[0][1]
        if pos >= len(visited) or visited[pos]:
            break
        visited[pos] = True
    return pos


def _pp_reachables(g: DepGraph, n: int, start: int) -> set[int]:
    # getPPReachables (java:152-181): BFS UP over nn|amod|appos|prep.*|pobj
    # incoming edges; only prep-governors enter the result set
    from collections import deque
    reach: set[int] = set()
    visited = [False] * max(n, 1)
    q = deque([start])
    while q:
        top = q.popleft()
        if top >= len(visited) or visited[top]:
            continue
        visited[top] = True
        for (reln, gov, _dep) in g.dep_edges(top):
            if _PP_CLIMB.fullmatch(reln):
                q.append(gov)
                if re.fullmatch(r"prep.*", reln):
                    reach.add(gov)
    return reach


def relex_features(tokens: list[str], g: DepGraph, e1: int,
                   e2: int) -> list[str]:
    """RelexPipe.pipe feature map as K=V strings (java:40-130 + 183-207)."""
    n = len(tokens)
    out: list[str] = []
    h1 = _entity_head(g, e1)
    h2 = _entity_head(g, e2)
    lcs = g.lcs(h1, h2)
    out.append("LCS=NONE" if lcs == -1 else "LCS=" + tokens[lcs])
    labels = _p3_path_labels(g, h1, h2)
    if labels is not None:
        out.append("SBJ=" + ("TRUE" if any("nsubj" in r for r in labels)
                             else "FALSE"))
        prep_chain = True
        collapsed: list[str] = []
        last = ""
        for reln in labels:
            if not _CHAIN_OK.fullmatch(reln):
                prep_chain = False
            if not _COLLAPSE_SKIP.fullmatch(reln) and reln != last:
                collapsed.append(reln + ":")
                last = reln
        out.append("CPATH=" + "".join(collapsed))
        out.append("PPChain?=" + ("true" if prep_chain else "false"))
        out.append("ROOT=" + tokens[_root_of(g, n, h1)])
        for (tag, h) in (("P1", h1), ("P2", h2)):
            parent = _first_parent(g, h)
            if parent == -1:
                out.append(f"{tag}=NONE")
            else:
                out.append(f"{tag}={tokens[parent]}-"
                           f"{_dependency_reln(g, parent, h)}")
        for (tag, h) in (("C1", h1), ("C2", h2)):
            for i, (_r, _g2, dep) in enumerate(g.gov_edges(h)[:2]):
                if dep < n:
                    out.append(f"{tag}{i}={tokens[dep]}")
    # PP-chain family runs on the ORIGINAL entity positions (java:58-59)
    r1 = _pp_reachables(g, n, e1)
    r2 = _pp_reachables(g, n, e2)
    common = sorted(r1 & r2)
    out.append("PP=" + (tokens[common[0]] if common else "NONE"))
    return out


def lll_gold_mapping(words: list[str], tokens: list[str]) -> dict[int, int]:
    """MERelex.getMapping (java:117-156) verbatim, including the cursor
    quirk: ``curIndex`` advances by ONE on most match kinds (not to the
    match position), and the hyphen-prefix branch does not advance it."""
    mapping: dict[int, int] = {}
    cur = 0
    for i, w in enumerate(words):
        found = False
        for j in range(cur, len(tokens)):
            t = tokens[j]
            if t == w:
                mapping[i] = j
                cur += 1
                found = True
                break
            if t.startswith(w) and "-" in t:
                mapping[i] = j
                found = True
                break
            if t.endswith(w) and "-" in t:
                mapping[i] = j
                cur += 1
                found = True
                break
            if w.startswith(t) and j < len(tokens) - 1 and tokens[j + 1] in w:
                mapping[i] = j
                cur += 1
                found = True
                break
        if not found:
            mapping[i] = -1
    return mapping


def lll_ml_candidates(tokens: list[str], lexe: list[str],
                      gold: set[tuple[int, int]]) -> list[tuple[int, int, bool]]:
    """MERelex.addThroughPipe candidate enumeration (java:95-114): every
    LEXE-B pair (i<j), positive iff its undirected signature is gold."""
    sigs = {(min(a, t), max(a, t)) for (a, t) in gold}
    out: list[tuple[int, int, bool]] = []
    n = len(tokens)
    for i in range(n):
        if lexe[i] != "B":
            continue
        for j in range(i + 1, n):
            if lexe[j] == "B":
                out.append((i, j, (i, j) in sigs))
    return out


def extended_relex_interactions(s, g: DepGraph,
                                restriction: frozenset[str]) -> list[Pair]:
    """ExtendedRelex.getInteractions (java:60-80): relx Rule1+Rule2+Rule4
    relations unioned with first-wins ordered-pair dedup."""
    from nlp_lib_spark.kernels.relx_rules import (relx_rule1, relx_rule2,
                                                  relx_rule4)
    relations = (relx_rule1(s, g, restriction)
                 + relx_rule2(s, g, restriction)
                 + relx_rule4(s, g))
    seen: set[Pair] = set()
    out: list[Pair] = []
    for pair in relations:
        if pair not in seen:
            seen.add(pair)
            out.append(pair)
    return out
