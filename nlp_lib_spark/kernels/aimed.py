"""AIMed relation-extraction feature pipe (the RelexPipeAIMed port).

``relx/RelexPipeAIMed.java`` is the ACTIVE AIMed featurizer
(``MERelexAIMed.java:411`` — the ``RelexPipeAIMed2`` / ``...Minipar``
variants are commented out there and in ``ppi/MLExtractor.java:407``).
Ported families, in pipe order (java:46-77):

* entity-head re-targeting (java:491-513): climb governor edges matching
  the per-entity pattern (``det|nn|amod|abbrev|num|conj`` for e1,
  ``det|nn|amod|num`` for e2), cycle-guarded, then swap so e1 < e2;
* baseline (java:234-287): LCS word+POS (or ``LCS=NONE``), ``ROOT1``
  governor-chain root word, ``P1``/``P2`` first-governor word-reln pairs
  (the C1/C2 child features are dead behind ``if (1 < 2) return``);
* rule1 (java:87-232): SBJ/RCMOD domain-term flags over the dependency
  path, the collapsed path string (``CPATH``), path length (``LEN``),
  and the conjunction-subject feature (``CONJ``) for pure
  nn/amod/appos/abbrev/conj paths; PMOD/APPOS/PTYPE/CPATHW/CC_CPATH/REL-i
  are computed-but-never-added in the reference and not ported;
* rule2 (java:292-396): common PP-chain ancestors over the CC graph
  (``PP=<word>`` + ``PP=<POS>&<pp1>&<pp2>``, else ``PP=NONE``) and the
  ``PP_PATH`` 30%-non-prepositional test;
* surface (java:397-430): POS/IN subsequence between the heads
  (``SUBS``), first-verb/last-prep pair (``CSUBS``), and the
  restriction-lexicon ``DOMAIN`` features;
* syntactic (java:432-464): Collins head word of the entities' tree LCA,
  plain and domain-flagged (``HEAD=``).

Path queries replicate ``getPathAsList`` / ``getPathAsIndexList``
(SimpleDepGraph.java:420-481,548-614) including the UNMARKED-queue BFS
(a frontier node's parent is overwritten by the last same-level toucher
before its dequeue) and the rcmod/partmod/dobj endpoint selection of the
index list.

The reference reads separate ``deps`` / ``depsCC`` files; this engine's
frozen builder already CC-distributes (kernels/depparse.py), so — like
kernels/rules.py:650 — one graph serves both slots.

Java semantics kept verbatim: ``boolean`` string-concats as
``true``/``false``; an empty collapsed path falls back to Java's
``List.toString()`` (``[a, b, c]``); HashSet<Integer> iteration is
modeled as ascending int order (Integer hashes to itself, and the
common-ancestor sets here are far smaller than the initial 16-bucket
table, so the model is exact for every reachable input).
"""

from __future__ import annotations

import re
from collections import deque

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.tree import Node, head_leaf, lca, leaf_position

# restriction lexicon, RelexPipeAIMed.java:37 (data table, cited verbatim)
RESTRICTION_TERMS: tuple[str, ...] = (
    "abolish", "abrogat", "acceler", "accelerat", "accumul", "acetylat",
    "acquir", "act", "activ", "activat", "adapt", "add", "addit", "adhe",
    "adher", "affect", "aggregat", "agoni", "alter", "amplif", "antagoni",
    "apparat", "assembl", "assist", "associat", "attach", "attack",
    "attenuat", "augment", "autophosphorylat", "autoregulat", "bind",
    "block", "bound", "carboxyl", "cataly", "cleav", "cluster",
    "co-operat", "co-precipit", "co-purifi", "coactivat", "coexist",
    "coexpres", "colocaliz", "compet", "complex", "component", "compris",
    "conjugat", "contact", "contain", "control", "convers", "convert",
    "cooperat", "coprecipit", "copurifi", "correlat", "counteract",
    "coupl", "cross-link", "cross-talk", "crosslink", "crosstalk",
    "deacetylat", "declin", "decreas", "degrad", "depend", "dephosphorylat",
    "deplet", "deposi", "depress", "deriv", "destruct", "dimer",
    "diminish", "dissociat", "down-regulat", "downregulat", "effect",
    "elevat", "encod", "enhanc", "enrich", "exert", "exhibit", "expos",
    "express", "form", "functio", "fuse", "generat", "glucosyl",
    "glycosyl", "heterodimer", "hydrol", "hyperexpr", "imitat",
    "immuno-precipit", "immunoprecipit", "import", "improv", "inactivat",
    "includ", "increas", "increment", "induc", "influenc", "inhibit",
    "initiat", "interact", "interfer", "interrupt", "ligand", "mediat",
    "migrat", "mobili", "moderat", "modif", "modulat", "neutrali",
    "obstruct", "operat", "oppos", "overexpress", "overproduc", "oxidis",
    "oxidiz", "phosphorylat", "potentiat", "prevent", "process", "produc",
    "prohibit", "promot", "react", "recogni", "recruit", "reduc",
    "regulat", "releas", "remov", "replac", "repress", "requir", "respond",
    "respons", "result", "secret", "sever", "signal", "splice", "stabili",
    "stimulat", "subunit", "suppress", "suspend", "synthesis", "target",
    "transactivat", "transcri", "transduc", "translat", "translocat",
    "transport", "transregulat", "trigger", "up-regulat", "upregulat",
    "us", "utilis", "utiliz", "yield",
)


def is_domain_term(term: str) -> bool:
    """RelexPipeAIMed.isDomainTerm (java:78-86): lowercase startswith any
    restriction term."""
    term = term.lower()
    return any(term.startswith(t) for t in RESTRICTION_TERMS)


def _bool(b: bool) -> str:
    return "true" if b else "false"


def path_with_indices(g: DepGraph, src: int, dst: int
                      ) -> tuple[list[str], list[int]] | None:
    """getPathAsList + getPathAsIndexList (SimpleDepGraph.java:420-481,
    548-614): ONE unmarked-queue BFS (identical in both Java methods —
    same parent array results), then the label walk and the
    rcmod/partmod/dobj endpoint selection."""
    size = 0
    nbrs: dict[int, set[int]] = {}
    lab: dict[tuple[int, int], str] = {}
    for (reln, gv, dp) in g.edges:
        size = max(size, gv, dp)
        lab[(gv, dp)] = reln          # matrix semantics: last edge wins
        lab[(dp, gv)] = "-" + reln
        nbrs.setdefault(gv, set()).add(dp)
        nbrs.setdefault(dp, set()).add(gv)
    if src > size or dst > size or src < 0 or dst < 0:
        return None
    size += 1
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
        for i in sorted(nbrs.get(v, ())):  # ascending matrix sweep
            if not visited[i]:
                parent[i] = v + 1
                q.append(i)
    if parent[dst] == 0:
        return None
    labels: list[str] = []
    indices: list[int] = []
    v = dst
    while v != src:
        p = parent[v] - 1
        rel = lab[(p, v)]
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


def entity_head_position(g: DepGraph, n: int, entity: int,
                         pattern: str) -> int:
    """java:491-513: climb first matching governor edge until none;
    revisiting a node returns the ORIGINAL entity."""
    visited = [False] * n
    dep = entity
    while True:
        visited[dep] = True
        deps = g.dep_edges(dep, pattern)
        if not deps:
            return dep
        dep = deps[0][1]
        if dep >= n or visited[dep]:
            return entity


def _get_root(g: DepGraph, n: int, pos: int) -> int:
    """java:479-489: follow first governors to the root, cycle-guarded."""
    visited = [False] * n
    while True:
        deps = g.dep_edges(pos)
        if not deps:
            break
        pos = deps[0][1]
        if pos >= n or visited[pos]:
            break
        visited[pos] = True
    return pos


def _get_parent(g: DepGraph, pos: int) -> int:
    deps = g.dep_edges(pos)
    return deps[0][1] if deps else -1


def _first_reln(g: DepGraph, gov: int, dep: int) -> str:
    """SimpleDepGraph.getDependency(gov, dep).reln() — first matching
    edge in insertion order."""
    for (reln, gv, dp) in g.edges:
        if gv == gov and dp == dep:
            return reln
    return ""


def _pp_reachables(g: DepGraph, n: int, dep: int) -> set[int]:
    """java:292-317: BFS up governor edges matching
    nn|amod|appos|prep.*|pobj, collecting governors of prep.* edges."""
    reach: set[int] = set()
    visited = [False] * n
    q: deque[int] = deque([dep])
    while q:
        top = q.popleft()
        if top >= n or visited[top]:
            continue
        visited[top] = True
        for (reln, gov, _d) in g.dep_edges(top):
            if re.fullmatch(r"nn|amod|appos|prep.*|pobj", reln):
                q.append(gov)
                if re.fullmatch(r"prep.*", reln):
                    reach.add(gov)
    return reach


def aimed_features(tokens: list[str], pos: list[str], g: DepGraph,
                   tree: Node | None, e1: int, e2: int) -> list[str]:
    """Feature-string list for one candidate pair (RelexPipeAIMed.pipe,
    java:46-77)."""
    n = len(tokens)
    e1 = entity_head_position(g, n, e1, "det|nn|amod|abbrev|num|conj")
    e2 = entity_head_position(g, n, e2, "det|nn|amod|num")
    if e1 > e2:
        e1, e2 = e2, e1
    feats: list[str] = []

    # ---- baseline (java:234-287) ----
    lcs = g.lcs(e1, e2)
    if lcs == -1:
        feats.append("LCS=NONE")
    else:
        feats.append("LCS=" + tokens[lcs])
        feats.append("LCS_POS=" + pos[lcs])
    feats.append("ROOT1=" + tokens[_get_root(g, n, e1)])
    p1 = _get_parent(g, e1)
    feats.append("P1=NONE" if p1 == -1
                 else f"P1={tokens[p1]}-{_first_reln(g, p1, e1)}")
    p2 = _get_parent(g, e2)
    feats.append("P2=NONE" if p2 == -1
                 else f"P2={tokens[p2]}-{_first_reln(g, p2, e2)}")

    # ---- rule1 (java:87-232) ----
    pw = path_with_indices(g, e1, e2)
    if pw is not None:
        labels, indices = pw
        subj_f, rcmod_f = "SBJ=NONE", "RCMOD=NONE"
        for i, rel in enumerate(labels):
            prefix = "-" if rel.startswith("-") else ""
            if "nsubj" in rel:
                subj_f = "SBJ=" + prefix + _bool(is_domain_term(
                    tokens[indices[i]]))
            elif "partmod" in rel:
                pass  # PMOD computed, never added (java:129)
            elif "rcmod" in rel:
                rcmod_f = "RCMOD=" + prefix + _bool(is_domain_term(
                    tokens[indices[i]]))
        feats.append(subj_f)
        feats.append(rcmod_f)
        cpath: list[str] = []
        for i, rel in enumerate(labels):
            if not re.fullmatch(r"-?(amod|nn|prep|conj)", rel):
                if re.fullmatch(r"-?(nsubj|nsubjpass|partmod|rcmod)", rel):
                    cpath.append(rel + ":")
                elif re.fullmatch(r"-?(pobj)", rel):
                    cpath.append(tokens[indices[i]] + ":")
                else:
                    cpath.append(rel + ":")
        collapsed = "".join(cpath)
        if not collapsed:
            collapsed = "[" + ", ".join(labels) + "]"  # List.toString()
        feats.append("CPATH=" + collapsed)
        feats.append(f"LEN={len(labels)}")
        valid = all(re.fullmatch(r"-?(nn|amod|appos|abbrev|conj)", r)
                    for r in labels)
        conj = any(re.fullmatch(r"-?conj", r) for r in labels)
        if conj and valid:
            subj_index = -1
            for (reln, gov, dep) in g.dep_edges(e1):
                if re.fullmatch(r"nsubj|nsubjpass", reln):
                    subj_index = gov
                    break
                if re.fullmatch(r"rcmod|partmod", reln):
                    subj_index = dep
                    break
            feats.append("CONJ=NONE" if subj_index == -1
                         else "CONJ=" + tokens[subj_index])

    # ---- rule2 (java:319-396) ----
    reach1 = _pp_reachables(g, n, e1)
    reach2 = _pp_reachables(g, n, e2)
    common = sorted(r for r in reach2 if r in reach1)
    if common:
        for c in common:
            got = path_with_indices(g, c, e1)
            if got is None:
                continue
            labels, indices = got
            pp1 = None
            for i in range(len(labels) - 1, -1, -1):
                if "pobj" in labels[i]:
                    pp1 = tokens[indices[i]]
                    break
            got = path_with_indices(g, c, e2)
            if got is None:
                continue
            labels, indices = got
            pp2 = None
            for i in range(len(labels) - 1, -1, -1):
                if "pobj" in labels[i]:
                    pp2 = tokens[indices[i]]
                    break
            feats.append("PP=" + tokens[c])
            # Java string-concat renders a null String as "null"
            feats.append(f"PP={pos[c]}"
                         f"&{pp1 if pp1 is not None else 'null'}"
                         f"&{pp2 if pp2 is not None else 'null'}")
    else:
        feats.append("PP=NONE")
    if pw is not None:
        labels = pw[0]
        cnt = sum(1 for r in labels
                  if not re.fullmatch(r"-?(prep|pobj|nn|amod)", r))
        pp_path = not (cnt / len(labels) > 0.3) if labels else True
        feats.append("PP_PATH=" + _bool(pp_path))

    # ---- surface (java:397-430) ----
    subs: list[str] = []
    first_verb, last_prep = "", ""
    for i in range(e1 + 1, e2):
        if re.fullmatch(r"VB.*", pos[i]):
            subs.append(pos[i] + ":")
            if not first_verb:
                first_verb = tokens[i]
        elif pos[i] == "IN":
            subs.append(tokens[i] + ":")
            last_prep = tokens[i]
    feats.append("SUBS=" + "".join(subs))
    feats.append(f"CSUBS={first_verb}-{last_prep}")
    sent = " ".join(tokens[e1:e2 + 1])
    domain = False
    for t in RESTRICTION_TERMS:
        if t in sent:
            feats.append("DOMAIN=" + t)
            domain = True
            break
    feats.append("DOMAIN=" + _bool(domain))

    # ---- syntactic (java:432-464) ----
    if tree is not None:
        node = lca(tree, e1, e2)
        if node is not None:
            head = head_leaf(node)
            head_value = "NONE"
            if head is not None:
                hi = leaf_position(tree, head)
                if hi != -1:
                    head_value = tokens[hi]
            feats.append("HEAD=" + head_value)
            feats.append("HEAD=" + _bool(is_domain_term(head_value)))
    return feats
