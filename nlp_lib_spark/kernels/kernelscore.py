"""Kernel-inspired similarity scoring over dependency backbone paths.

Re-expression of the reference's custom SVM kernels as pure per-sentence
scoring functions, runnable inside Arrow-batched pandas UDFs against a
*broadcast prototype set* (the Spark-native runtime shape: no Gram
matrix, no SVM — each candidate is scored by its best alignment with a
small set of labeled prototype instances).

Ported semantics (reference file:line):

- Backbone path e1 --(-reln)--> LCS --(reln)--> e2 as an alternating
  [token_idx, reln, token_idx, ...] string list:
  ``libsvm/LCSDepPathKernel.getBackBonePath`` (LCSDepPathKernel.java:161-213)
  and ``ppi/filter/CorpusReader.getPath`` (CorpusReader.java:261-301).
- Ancestor collection by BFS over dep->gov edges, LCS = first ancestor
  of e2 (BFS order) also reachable from e1 and != e1
  (LCSDepPathKernel.java:215-239, CorpusReader.java:236-259 — the
  CorpusReader variant skips ``conj_(and|or)`` edges to avoid loops).
- getLCS2 DOMAIN-governor promotion quirk (CorpusReader.java:189-228):
  when the LCS falls outside [e1, e2], is a non-DOMAIN noun, and
  neither entity is DOMAIN-tagged, promote to a DOMAIN-tagged governor.
- LCS dynamic program over interior path positions with word/relation
  parity, scores stem=3 / domain-or-prot=2 / pos=1 per word and 6 /
  family-3 per relation, normalized by ``6 * (min(m,n)-2)`` and damped
  by ``0.8^(|m-n|/2)`` (LCSDepPathKernel.java:111-159, 264-298).
- RelationInstance typing LEFT/MIDDLE/RIGHT by LCS position, abbrev
  path trimming, and key-term selection
  (ppi/filter/RelationInstance.java:115-194).  NOTE the reference
  computes ``findKeyTerm`` *before* assigning ``lcsIndex`` (constructor
  order RelationInstance.java:47-52), so its search loops start at path
  position 0, not at the LCS: the effective rule — replicated here — is
  "key = lcs if DOMAIN-tagged, else the first even-position DOMAIN
  token scanning the whole path, else lcs".
- SimpleFeatureKernel left/right/full feature sets and the
  cosine-of-binary-vectors sum with a hard type gate
  (ppi/filter/SimpleFeatureKernel.java:24-196; vectors are built from
  HashSets via FeatureSet2Vector.java:25-32, hence binary).

All functions are pure and operate on (tokens, pos, domain, DepGraph)
for one sentence — tiny graphs, O(V+E) per call.
"""

from __future__ import annotations

import math
import re
from collections import Counter, deque

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.stem import stem

SCORE_STEM = 3
SCORE_DOM_OR_PROT = 2
SCORE_POS = 1
SCORE_UNIT = 6
SCORE_REL = 6
LAMBDA = 0.8

LEFT, MIDDLE, RIGHT = "LEFT", "MIDDLE", "RIGHT"

_CONJ_RE = re.compile(r"conj_(and|or)")


def ancestors(graph: DepGraph, n_tokens: int, node: int,
              skip_conj: bool = False) -> list[int]:
    """Governor closure of ``node`` in BFS order (duplicates preserved,
    as the reference appends before its visited check).
    LCSDepPathKernel.java:215-239; skip_conj per CorpusReader.java:252-254."""
    out: list[int] = []
    visited = [False] * max(n_tokens, node + 1)
    q = deque([node])
    while q:
        nxt = q.popleft()
        if nxt >= len(visited) or visited[nxt]:
            continue
        visited[nxt] = True
        for (reln, gov, dep) in graph.dep_edges(nxt):
            if skip_conj and _CONJ_RE.fullmatch(reln):
                continue
            out.append(gov)
            q.append(gov)
    return out


def find_lcs(graph: DepGraph, n_tokens: int, e1: int, e2: int,
             skip_conj: bool = False) -> int:
    """First ancestor of e2 (BFS order) that is also an ancestor of e1
    and != e1; -1 when none (CorpusReader.getLCS, LCSDepPathKernel)."""
    anc1 = set(ancestors(graph, n_tokens, e1, skip_conj))
    for a in ancestors(graph, n_tokens, e2, skip_conj):
        if a != e1 and a in anc1:
            return a
    return -1


def find_lcs2(graph: DepGraph, n_tokens: int, e1: int, e2: int,
              pos: list[str], domain: list[str | None]) -> int:
    """getLCS2 (CorpusReader.java:189-228): plain LCS plus the
    DOMAIN-governor promotion quirk for out-of-span noun LCS."""
    lcs = find_lcs(graph, n_tokens, e1, e2, skip_conj=True)
    if (lcs != -1 and (lcs < e1 or lcs > e2) and e1 != e2
            and domain[e1] is None and domain[e2] is None):
        if pos[lcs].startswith("N") and domain[lcs] is None:
            for (reln, gov, dep) in graph.dep_edges(lcs):
                if domain[gov] is not None:
                    lcs = gov  # last matching governor wins (java:215-219)
    return lcs


def _directed_path(graph: DepGraph, src: int, dst: int):
    """getPathAsRelnList(src, dst, directed=true): BFS over gov->dep
    edges only, ascending-neighbor tie-break (SimpleDepGraph.java:483-546)."""
    return graph.path_edges(src, dst, directed=True)


def backbone_path(graph: DepGraph, n_tokens: int, e1: int, e2: int,
                  lcs: int | None = None) -> list[str] | None:
    """LCSDepPathKernel.getBackBonePath (java:161-213).

    Returns the alternating [idx, reln, idx, ..., idx] list:
    left half descends LCS->e1 reversed with ``-reln`` labels, right
    half LCS->e2 with plain labels.  When no LCS exists, falls back to
    the undirected e1->e2 path with the reference's first-edge
    direction quirk (java:192-201: the sign of *all* labels is decided
    by whether the first traversed edge is a real gov->dep edge).
    """
    if lcs is None:
        lcs = find_lcs(graph, n_tokens, e1, e2)
    if lcs == -1:
        rels = graph.path_edges(e1, e2)  # original gov/dep orientation
        if not rels:
            return None
        # re-orient to traversal order e1 -> e2: the reference's
        # undirected getPathAsRelnList swaps gov/dep on reversed edges
        # so gov() is always the traversal source (SimpleDepGraph.java:503)
        trav: list[tuple[str, int, int]] = []
        cur = e1
        for (reln, gov, dep) in rels:
            other = dep if gov == cur else gov
            trav.append((reln, cur, other))
            cur = other
        right_direction = rels[0][1] == e1  # first hop is a real gov->dep
        path: list[str] = []
        for (reln, gov, dep) in trav:
            path.append(str(gov))
            path.append(reln if right_direction else "-" + reln)
        path.append(str(trav[-1][2]))
        return path
    return _lcs_path(graph, e1, e2, lcs)


def _lcs_path(graph: DepGraph, e1: int, e2: int, lcs: int) -> list[str]:
    """CorpusReader.getPath (java:261-301) incl. the ``null`` edge
    placeholders when a directed half-path is missing."""
    path1 = _directed_path(graph, lcs, e1) if lcs != e1 else None
    path2 = _directed_path(graph, lcs, e2) if lcs != e2 else None
    path: list[str] = []
    if not path1:
        path.append(str(lcs))
        path.append("-null")
    else:
        for (reln, gov, dep) in reversed(path1):
            path.append(str(dep))
            path.append("-" + reln)
    if not path2:
        path.append(str(lcs))
        path.append("null")
        path.append(str(e2))
    else:
        for (reln, gov, dep) in path2:
            path.append(str(gov))
            path.append(reln)
        path.append(str(e2))
    return path


def fix_path(path: list[str] | None) -> list[str] | None:
    """Trim leading ``-abbrev`` / trailing ``abbrev`` hops
    (RelationInstance.fixPath, java:115-126)."""
    if path is None:
        return None
    path = list(path)
    if len(path) >= 2 and path[1] == "-abbrev":
        del path[0:2]
    if len(path) >= 2 and path[-2] == "abbrev":
        del path[-2:]
    return path


def _word_score(tokens1, pos1, dom1, i1, tokens2, pos2, dom2, i2) -> int:
    """Word-node alignment score (LCSDepPathKernel.getScore, java:264-285)."""
    s = 0
    if stem(tokens1[i1]) == stem(tokens2[i2]):
        s += SCORE_STEM + SCORE_DOM_OR_PROT
        if pos1[i1] == pos2[i2]:
            s += SCORE_POS
    elif dom1[i1] is not None and dom2[i2] is not None:
        s += SCORE_DOM_OR_PROT
        if pos1[i1] == pos2[i2]:
            s += SCORE_POS
    elif pos1[i1] == pos2[i2]:
        s += SCORE_POS
    return s


def _reln_score(r1: str, r2: str) -> int:
    """Relation alignment score (java:286-296)."""
    if r1 == r2:
        return SCORE_REL
    for pref in ("-nsubj", "prep", "-prep"):
        if r1.startswith(pref) and r2.startswith(pref):
            return SCORE_REL // 2
    return 0


def lcs_dep_path_score(path1, ctx1, path2, ctx2) -> float:
    """evaluateDepPathLCSKernel (java:111-159): LCS dynamic program over
    interior path positions (endpoints excluded), parity-locked so words
    align with words and relations with relations; normalized by
    ``SCORE_UNIT * (min(m,n) - 2)`` and damped by ``0.8^(|m-n|/2)``.

    ``ctx`` = (tokens, pos, domain) of the owning sentence.
    """
    if path1 is None or path2 is None:
        return 0.0
    m, n = len(path1), len(path2)
    if m < 3 or n < 3:
        return 0.0
    t1, p1, d1 = ctx1
    t2, p2, d2 = ctx2
    c = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m - 1):
        for j in range(1, n - 1):
            if (i % 2) != (j % 2):
                c[i][j] = max(c[i - 1][j], c[i][j - 1])
            else:
                if i % 2 == 0:
                    sc = _word_score(t1, p1, d1, int(path1[i]),
                                     t2, p2, d2, int(path2[j]))
                else:
                    sc = _reln_score(path1[i], path2[j])
                c[i][j] = max(c[i - 1][j - 1] + sc,
                              c[i - 1][j], c[i][j - 1])
    return (LAMBDA ** (abs(m - n) // 2)
            * c[m - 2][n - 2] / (SCORE_UNIT * (min(m, n) - 2)))


# ---------------------------------------------------------------------------
# RelationInstance + SimpleFeatureKernel
# ---------------------------------------------------------------------------

def _index_in_path(path: list[str] | None, index: int) -> int:
    """getIndexInPath (java:181-194): first path position holding the
    token index as a string; 0 when absent (dist initialized to 0)."""
    if path is None:
        return -1
    s = str(index)
    for i, v in enumerate(path):
        if v == s:
            return i
    return 0


def _find_key_term(path, lcs, domain, pos) -> int:
    """Effective findKeyTerm semantics (see module docstring on the
    constructor-order quirk, RelationInstance.java:128-169)."""
    if path is None:
        return lcs
    if 0 <= lcs < len(domain) and domain[lcs] is not None:
        return lcs
    for i in range(0, len(path), 2):
        idx = int(path[i])
        if domain[idx] is not None:
            return idx
    return lcs


def _half_features(path, lcs_index, tokens, pos, domain, e1, e2,
                   left: bool) -> set[str]:
    """SimpleFeatureKernel.getLeftVector/getRightVector
    (SimpleFeatureKernel.java:44-159)."""
    feats: set[str] = set()
    if left:
        rng = range(lcs_index, -1, -1)
    else:
        rng = range(lcs_index, len(path))
    for i in rng:
        if i % 2 == 0:
            idx = int(path[i])
            word = tokens[idx]
            pchar = pos[idx][:1]
            if "-" in word:
                word = word.rsplit("-", 1)[1]
            is_dom = domain[idx] is not None
            if is_dom:
                feats.add("REL-" + pchar)
                feats.add(word.lower())
            elif idx == e1 or idx == e2:
                pass  # entity endpoints contribute nothing (java:75-78)
            elif word.startswith("PROTEIN"):
                feats.add("PROT")
            else:
                feats.add(word.lower())
        else:
            reln = path[i]
            if left and reln.startswith("-prep"):
                feats.add("-prep")
            if not left and reln.startswith("prep"):
                feats.add("prep")
            dist = (lcs_index - i) if left else (i - lcs_index)
            feats.add(reln + str(dist // 3))
    return feats


def relation_instance(tokens, pos, domain, graph: DepGraph,
                      e1: int, e2: int) -> dict:
    """Build the scoring view of one candidate pair
    (RelationInstance.java:36-66 + CorpusReader.getRelationInstances)."""
    n = len(tokens)
    lcs = find_lcs2(graph, n, e1, e2, pos, domain)
    path = backbone_path(graph, n, e1, e2, lcs=lcs)
    path = fix_path(path)
    key = _find_key_term(path, lcs, domain, pos)
    if lcs < e1:
        typ = LEFT
    elif lcs < e2:
        typ = MIDDLE
    else:
        typ = RIGHT
    lcs_index = _index_in_path(path, lcs)
    left = (_half_features(path, lcs_index, tokens, pos, domain, e1, e2, True)
            if path is not None else None)
    right = (_half_features(path, lcs_index, tokens, pos, domain, e1, e2,
                            False) if path is not None else None)
    full: Counter = Counter()
    if left:
        full.update(left)
    if right:
        full.update(right)
    if path is not None and 0 < lcs_index < len(path) - 1:
        full.update([path[lcs_index - 1] + pos[lcs][:1]
                     + path[lcs_index + 1]])  # LCS triple (java:177-179)
    return {"path": path, "lcs": lcs, "key": key, "type": typ,
            "lcs_index": lcs_index, "left": left, "right": right,
            "full": full, "e1": e1, "e2": e2,
            "ctx": (tokens, pos, domain)}


def backbone_domain_terms(inst: dict) -> list[str]:
    """DOMAIN terms on the backbone word nodes, path order
    (DomainTermRanker.rank's per-instance contribution,
    ppi/filter/DomainTermRanker.java:28-51)."""
    path = inst["path"]
    if path is None:
        return []
    _, _, domain = inst["ctx"]
    out = []
    for i in range(0, len(path), 2):
        idx = int(path[i])
        if domain[idx] is not None:
            out.append(domain[idx])
    return out


def set_ranked_key_term(inst: dict, rank_map: dict[str, float]) -> dict:
    """RelationInstance.setRankedKeyTerm (java:68-113): re-pick the key
    term as the highest-ranked DOMAIN verb on the backbone (falling back
    to any DOMAIN token); the chosen key also becomes the LCS for
    feature purposes.  ``rank_map`` is the broadcast DomainTermRanker
    output; unknown terms rank 0 (java getRank:65-71)."""
    path = inst["path"]
    if path is None:
        inst["key"] = inst["lcs"]
        return inst
    _, pos, domain = inst["ctx"]
    best, best_rank, best_pi = -1, -1.0, -1
    for verbs_only in (True, False):
        for i in range(0, len(path), 2):
            idx = int(path[i])
            if domain[idx] is None:
                continue
            if verbs_only and not pos[idx].startswith("V"):
                continue
            rank = rank_map.get(domain[idx].lower(), 0.0)
            if rank > best_rank:
                best_rank = rank
                best = idx
                best_pi = i
        if best != -1:
            break
    if best == -1:
        inst["key"] = inst["lcs"]
    else:
        inst["key"] = best
        inst["lcs"] = best
        inst["lcs_index"] = best_pi
    return inst


def _cos_sets(a: set[str] | None, b: set[str] | None) -> float:
    if not a or not b:
        return 0.0
    return len(a & b) / math.sqrt(len(a) * len(b))


def _cos_counts(a: Counter, b: Counter) -> float:
    if not a or not b:
        return 0.0
    dot = sum(v * b[k] for k, v in a.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def simple_feature_kernel(i1: dict, i2: dict) -> float:
    """SimpleFeatureKernel.evaluate (java:24-42): hard type gate, then
    cosine(left)+cosine(right)+cosine(full)."""
    if i1["type"] != i2["type"]:
        return 0.0
    return (_cos_sets(i1["left"], i2["left"])
            + _cos_sets(i1["right"], i2["right"])
            + _cos_counts(i1["full"], i2["full"]))


def lcs_dep_path_kernel(i1: dict, i2: dict) -> float:
    """LCSDepPathKernel.evaluate (java:96-109) over instance dicts."""
    return lcs_dep_path_score(i1["path"], i1["ctx"], i2["path"], i2["ctx"])


def prototype_score(inst: dict, prototypes: list[dict],
                    kernel: str = "lcs") -> float:
    """Runtime 'kernel-inspired scoring': best alignment of a candidate
    against a broadcast prototype set — max over labeled prototypes of
    the chosen kernel, the Spark-native replacement for the reference's
    train-time Gram matrix (libsvm/PPI.java:117-140 computes all-pairs;
    at 10^12 turns only candidate-vs-broadcast-prototypes is feasible).
    """
    k = (lcs_dep_path_kernel if kernel == "lcs" else simple_feature_kernel)
    best = 0.0
    for p in prototypes:
        v = k(inst, p)
        if v > best:
            best = v
    return best


# ---------------------------------------------------------------------------
# SimpleKernel / EditDistanceKernel / global-context kernel
# (ppi/filter/SimpleKernel.java, ppi/filter/EditDistanceKernel.java)
# ---------------------------------------------------------------------------

def _lcs_index(inst: dict) -> int:
    """getLCSIndexInPath (SimpleKernel.java:222-234 / EditDistanceKernel
    .java:85-97): recomputed from ``lcs`` — 0 when absent."""
    idx = _index_in_path(inst["path"], inst["lcs"])
    return idx if idx >= 0 else 0


def _sk_set(inst: dict, start: int, end: int) -> set[str]:
    """SimpleKernel.makeHashSet (java:253-299): path words (last hyphen
    part), REL-<pos-initial> for DOMAIN words, relns with prep family
    markers and nsubjpass->nsubj collapse."""
    tokens, pos, domain = inst["ctx"]
    path = inst["path"]
    out: set[str] = set()
    for i in range(start, end + 1):
        if i % 2 == 0:
            idx = int(path[i])
            word = tokens[idx].lower()
            if "-" in word:
                word = word.rsplit("-", 1)[1]
            out.add(word)
            if domain[idx] is not None:
                out.add("REL-" + pos[idx][:1])
        else:
            reln = path[i]
            if reln.startswith("prep"):
                out.add("prep")
            elif reln.startswith("-prep"):
                out.add("-prep")
            if reln == "nsubjpass":
                reln = "nsubj"
            elif reln == "-nsubjpass":
                reln = "-nsubj"
            out.add(reln)
    return out


def _norm_dot(a: set[str], b: set[str]) -> float:
    d = math.sqrt(len(a) * len(b))
    return len(a & b) / d if d > 0 else float(len(a & b))


def simple_kernel(i1: dict, i2: dict) -> float:
    """SimpleKernel.evaluateSimpleKernel (java:120-157): type gate, then
    normalized set overlaps of the left / right / full backbone halves."""
    if i1["type"] != i2["type"] or i1["path"] is None or i2["path"] is None:
        return 0.0
    l1, l2 = _lcs_index(i1), _lcs_index(i2)
    left1 = _sk_set(i1, 1, l1)
    left2 = _sk_set(i2, 1, l2)
    right1 = _sk_set(i1, l1, len(i1["path"]) - 1)
    right2 = _sk_set(i2, l2, len(i2["path"]) - 1)
    return (_norm_dot(left1, left2) + _norm_dot(right1, right2)
            + _norm_dot(left1 | right1, left2 | right2))


_GC_POS = frozenset("vnjrit")


def _gc_vector(inst: dict, start: int, end: int) -> set[str]:
    """SimpleKernel.getVector (java:90-108): lowercase words (last hyphen
    part), placeholders skipped, content POS initials only."""
    tokens, pos, _domain = inst["ctx"]
    out: set[str] = set()
    for i in range(start, end + 1):
        word = tokens[i].lower()
        if "-" in word:
            word = word.rsplit("-", 1)[1]
        if tokens[i].startswith("PROTEIN"):
            continue
        if pos[i][:1].lower() in _GC_POS:
            out.add(word)
    return out


def global_context_kernel(i1: dict, i2: dict, domain=None,
                          synsets: dict | None = None) -> float:
    """SimpleKernel.evaluateGlobalContextKernel (java:44-88): cosine of the
    fore-between / between / between-after word-set windows.  ``domain`` +
    ``synsets`` enable the dot2 synset-bridged match for DOMAIN terms
    (java:308-331 via kernels/synsets.syn_match); without them the plain
    set dot applies."""
    if i1["type"] != i2["type"]:
        return 0.0

    def dot2(a: set[str], b: set[str]) -> float:
        score = 0
        for w in a:
            if w in b:
                score += 1
            elif (domain is not None and synsets is not None
                  and domain.is_domain_term(w)):
                from nlp_lib_spark.kernels.synsets import syn_set
                sw = syn_set(synsets, w)
                if sw and any((syn_set(synsets, v) or frozenset()) & sw
                              for v in b):
                    score += 1
        return float(score)

    score = 0.0
    n1 = len(i1["ctx"][0])
    n2 = len(i2["ctx"][0])
    windows = []
    if i1["e1"] > 0 and i2["e1"] > 0:
        windows.append(((0, i1["e1"] - 1), (0, i2["e1"] - 1)))
    if i1["e2"] > i1["e1"] + 1 and i2["e2"] > i2["e1"] + 1:
        windows.append(((i1["e1"], i1["e2"]), (i2["e1"], i2["e2"])))
    if i1["e2"] < n1 - 1 and i2["e2"] < n2 - 1:
        windows.append(((i1["e2"] + 1, n1 - 1), (i2["e2"] + 1, n2 - 1)))
    for (a_rng, b_rng) in windows:
        a = _gc_vector(i1, *a_rng)
        b = _gc_vector(i2, *b_rng)
        s = dot2(a, b)
        d = math.sqrt(len(a) * len(b))
        score += s / d if d > 0 else s
    return score


def edit_distance_kernel(i1: dict, i2: dict) -> float:
    """EditDistanceKernel.evaluate (java:21-41): type gate, then
    exp(-editdist/maxlen) over the left / right / full backbone segments.
    Word equality uses the frozen stem as the BASE-lemma stand-in (the
    reference reads GeniaTagger's BASE tag; this engine's morphological
    normalizer is kernels/stem), PROTEIN placeholders match each other,
    and DOMAIN words with equal POS initials match (java:57-64)."""
    if i1["type"] != i2["type"] or i1["path"] is None or i2["path"] is None:
        return 0.0
    t1, p1, d1 = i1["ctx"]
    t2, p2, d2 = i2["ctx"]
    path1, path2 = i1["path"], i2["path"]

    def seg(s1: int, e1: int, s2: int, e2: int) -> float:
        len1 = e1 - s1 + 1
        len2 = e2 - s2 + 1
        c = [[0] * (len2 + 1) for _ in range(len1 + 1)]
        for i in range(len1 + 1):
            c[i][0] = i
        for j in range(len2 + 1):
            c[0][j] = j
        for i in range(1, len1 + 1):
            for j in range(1, len2 + 1):
                a = s1 + i - 1
                b = s2 + j - 1
                match = False
                if a % 2 == b % 2:
                    if a % 2 == 0:
                        p = int(path1[a])
                        q = int(path2[b])
                        w1, w2 = stem(t1[p]), stem(t2[q])
                        if w1 == w2 or ("PROTEIN" in t1[p]
                                        and "PROTEIN" in t2[q]):
                            match = True
                        elif (d1[p] is not None and d2[q] is not None
                              and p1[p][:1] == p2[q][:1]):
                            match = True
                    else:
                        match = path1[a] == path2[b]
                if match:
                    c[i][j] = c[i - 1][j - 1]
                else:
                    c[i][j] = min(c[i - 1][j], c[i][j - 1]) + 1
        return math.exp(-1.0 * c[len1][len2] / max(len1, len2))

    l1, l2 = _lcs_index(i1), _lcs_index(i2)
    return (seg(0, l1, 0, l2)
            + seg(l1, len(path1) - 1, l2, len(path2) - 1)
            + seg(0, len(path1) - 1, 0, len(path2) - 1))


# --------------- remaining experiment kernels (coverage-ledger closure)
_SK2_GAMMA = 0.001953125  # SimpleKernel2.java:62
_PSK_DIST_WT = 0.5        # PathStructureKernel.java:15
_PSK_DIFF_WT = 0.9


def simple_kernel2(i1: dict, i2: dict) -> float:
    """SimpleKernel2.evaluateSimpleKernel (java:50-63): type gate, then an
    RBF over a mixed sparse vector (deduped left/right half lemma-POS-reln
    features, half lengths, LCS distances, a token read at the PATH index
    of the LCS — the reference's lcsIndex-as-sentence-index quirk, totalized
    with a bounds guard — and sentence-level PROTEIN/DOMAIN counts).
    Lemma slot uses the frozen stem, the repo-wide BASE stand-in."""
    if i1["type"] != i2["type"] or i1["path"] is None or i2["path"] is None:
        return 0.0

    def vec(inst: dict) -> dict[str, float]:
        tokens, pos, domain = inst["ctx"]
        path = inst["path"]
        li = _lcs_index(inst)
        v: dict[str, float] = {}

        def add(key: str, val: float) -> None:
            v[key] = v.get(key, 0.0) + val

        for (lo, hi, wk, pk) in ((1, li, "W1=", "POS1="),
                                 (li + 1, len(path) - 1, "W2=", "POS2=")):
            seen: set[str] = set()
            for i in range(lo, hi):
                if i % 2 == 0:
                    idx = int(path[i])
                    for key in (wk + stem(tokens[idx]), pk + pos[idx]):
                        if key not in seen:
                            add(key, 1.0)
                            seen.add(key)
                else:
                    if path[i] not in seen:
                        add(path[i], 1.0)
                        seen.add(path[i])
        add("H1=", li / 2.0)
        add("D1=", abs(inst["e1"] - inst["lcs"]))
        if li < len(tokens):  # java:97 reads s.get(lcsIndex) unguarded
            add(tokens[li], 1.0)
        add("H2=", (len(path) - li) / 2.0)
        add("D2=", abs(inst["e2"] - inst["lcs"]))
        add("C1=", sum(1 for t in tokens if "PROTEIN" in t))
        add("C2=", sum(1 for d in domain if d is not None))
        return v

    v1, v2 = vec(i1), vec(i2)
    sq = 0.0
    for k in set(v1) | set(v2):
        d = v1.get(k, 0.0) - v2.get(k, 0.0)
        sq += d * d
    return math.exp(-_SK2_GAMMA * sq)


def _fk_rel_pos(inst: dict, i: int) -> str:
    # FeatureKernel.getRelativePosition (java:204-212)
    if i < inst["e1"]:
        return "L"
    if i <= inst["e2"]:
        return "M"
    return "R"


def _fk_half_set(inst: dict, left: bool) -> set[str]:
    """FeatureKernel.getLeftVector/getRightVector (java:31-179): walk one
    backbone half from the LCS, emitting lemma/word/position/reln
    conjunctions (Java null-concat renders as the literal 'null'),
    prep-family markers, bigram reln chains, and the key-term DOMAIN
    feature, plus the ±4 DOMAIN window around the near entity."""
    tokens, pos, domain = inst["ctx"]
    path = inst["path"]
    size = len(path)
    li = inst["lcs_index"]
    out: set[str] = set()
    if left:
        prev_reln = path[li + 1] if li < size - 1 else "null"
        rng = range(li, -1, -2)
    else:
        prev_reln = path[li - 1] if li > 0 else "null"
        rng = range(li, size, 2)
    for i in rng:
        idx = int(path[i])
        word = tokens[idx].lower()
        base = stem(tokens[idx]).lower()
        position = _fk_rel_pos(inst, idx)
        if "-" in word:
            word = word.rsplit("-", 1)[1]
        if "-" in base:
            base = base.rsplit("-", 1)[1]
        if left:
            reln = path[i - 1] if i > 0 else None
        else:
            reln = path[i + 1] if i < size - 1 else None
        reln_s = reln if reln is not None else "null"
        if domain[idx] is not None:
            out.add("REL-" + pos[idx][:1])
            out.add(word)
            out.add(base)
            out.add(word + position)
            out.add(word + reln_s)
            out.add(word + reln_s + position)
            if idx == inst["key"]:
                out.add("Key-" + domain[idx])
        else:
            out.add(word + position)
        if reln is not None:
            out.add(reln)
            if reln.startswith("prep"):
                out.add("prep")
            elif reln.startswith("-prep"):
                out.add("-prep")
        out.add(prev_reln + reln_s)
        out.add(prev_reln + base + reln_s)
        prev_reln = reln_s
    ent = inst["e1"] if left else inst["e2"]
    n = len(tokens)
    for i in range(max(ent - 4, 0), min(ent + 4, n - 1) + 1):
        if domain[i] is not None:
            out.add("S-" + stem(tokens[i]) + _fk_rel_pos(inst, i))
    return out


def feature_kernel(i1: dict, i2: dict) -> float:
    """FeatureKernel.evaluate (java:18-29): type gate, then normalized dot
    of the left-half and right-half feature sets."""
    if i1["type"] != i2["type"] or i1["path"] is None or i2["path"] is None:
        return 0.0
    return (_norm_dot(_fk_half_set(i1, True), _fk_half_set(i2, True))
            + _norm_dot(_fk_half_set(i1, False), _fk_half_set(i2, False)))


def dep_walk_kernel(i1: dict, i2: dict, q_min: int = 2,
                    q_max: int = 2) -> float:
    """DepWalkKernel.evaluate (java:33-77): best-scoring aligned dependency
    walks of length q_min..q_max over the two backbone paths; word nodes
    score 3 (entity-placeholder match, via the e1/e2 slots) or 1 (lemma
    match, frozen stem as BASE), relations 6."""
    if i1["type"] != i2["type"] or i1["path"] is None or i2["path"] is None:
        return 0.0
    t1, _p1, _d1 = i1["ctx"]
    t2, _p2, _d2 = i2["ctx"]
    path1, path2 = i1["path"], i2["path"]

    def word_of(inst, tokens, idx: int) -> str:
        if idx == inst["e1"]:
            return "ENTITY1"
        if idx == inst["e2"]:
            return "ENTITY2"
        return stem(tokens[idx])

    def w_score(si1: str, si2: str) -> int:
        w1 = word_of(i1, t1, int(si1))
        w2 = word_of(i2, t2, int(si2))
        if w1 == w2:
            return 3 if w1.startswith("ENTITY") else 1
        return 0

    def r_score(r1: str, r2: str) -> int:
        return 6 if r1 == r2 else 0

    n1, n2 = len(path1), len(path2)
    scores = [0.0] * (q_max + 1)
    c = {}
    for i in range(0, n1 - 2, 2):
        for j in range(0, n2 - 2, 2):
            s = (w_score(path1[i], path2[j])
                 + r_score(path1[i + 1], path2[j + 1])
                 + w_score(path1[i + 2], path2[j + 2]))
            c[(i, j, 2)] = s
            scores[2] = max(scores[2], s)
    for k in range(3, q_max + 1):
        for i in range(0, n1 - 2 * (k - 1), 2):
            for j in range(0, n2 - 2 * (k - 1), 2):
                s = (c[(i + 2, j + 2, k - 1)]
                     + w_score(path1[i], path2[j])
                     + r_score(path1[i + 1], path2[j + 1]))
                c[(i, j, k)] = s
                scores[k] = max(scores[k], s)
    return float(sum(scores[2:q_max + 1]))


def _psk_series(r: float, n: int) -> float:
    return (r ** n - 1.0) / (r - 1.0)


def _psk_half(inst: dict, left: bool) -> list[str]:
    # PathStructureKernel.getLeftPath/getRightPath (java:116-143): POS at
    # word slots; left half strips the reversed-edge marker (substring(1))
    tokens, pos, _dom = inst["ctx"]
    path = inst["path"]
    li = inst["lcs_index"]
    out: list[str] = []
    rng = range(li, -1, -1) if left else range(li, len(path))
    for i in rng:
        if i % 2 == 0:
            out.append(pos[int(path[i])])
        else:
            out.append(path[i][1:] if left else path[i])
    return out


def _psk_align(p1: list[str], p2: list[str]) -> float:
    total = 0.0
    for i, w1 in enumerate(p1):
        best = 0.0
        for j, w2 in enumerate(p2):
            if i % 2 == 0 and j % 2 == 0:
                s = 1.0 if w1 == w2 else (0.5 if w1[:1] == w2[:1] else 0.0)
                k1, k2 = i // 2, j // 2
            elif i % 2 == 1 and j % 2 == 1:
                if w1 == w2:
                    s = 1.0
                elif (w1.startswith("prep") and w2.startswith("prep")) or \
                        (w1.startswith("nsubj") and w2.startswith("nsubj")):
                    s = 0.5
                else:
                    s = 0.0
                k1, k2 = (i - 1) // 2, (j - 1) // 2
            else:
                continue
            if s > 0:
                s *= _PSK_DIFF_WT ** abs(k1 - k2)
                s *= _PSK_DIST_WT ** ((k1 + k2) / 2.0)
                best = max(best, s)
        total += best

    def norm(p: list[str]) -> float:
        sz = len(p)
        return (_psk_series(_PSK_DIST_WT, (sz + 1) // 2)
                + _psk_series(_PSK_DIST_WT, sz // 2))

    d = math.sqrt(norm(p1) * norm(p2))
    return total / d if d > 0 else 0.0


def path_structure_kernel(i1: dict, i2: dict) -> float:
    """PathStructureKernel.evaluate (java:19-42): position-damped POS/reln
    alignment of the left and right backbone halves (product) plus a
    normalized domain-set overlap."""
    if i1["type"] != i2["type"] or i1["path"] is None or i2["path"] is None:
        return 0.0

    def dom_set(inst: dict) -> set[str]:
        tokens, pos, domain = inst["ctx"]
        out: set[str] = set()
        for i in range(0, len(inst["path"]), 2):
            idx = int(inst["path"][i])
            if domain[idx] is not None:
                out.add("REL-" + pos[idx][:1])
            out.add(stem(tokens[idx]).lower())
        return out

    left = _psk_align(_psk_half(i1, True), _psk_half(i2, True))
    right = _psk_align(_psk_half(i1, False), _psk_half(i2, False))
    return left * right + _norm_dot(dom_set(i1), dom_set(i2))


def similarity_kernel(i1: dict, i2: dict,
                      sim_map: dict[tuple[str, str], float],
                      domain=None) -> float:
    """SimilarityKernel.evaluateSimilarity (java:45-78): per sentence
    window (before e1 / between / after e2), best WordNet-similarity match
    of the DOMAIN lemma sets, thresholded at 0.4, each window normalized
    by the smaller set.  ``sim_map`` is the broadcast pair-similarity
    table (the reference's similarity_score_wup.txt, keyed on the sorted
    lemma pair); ``domain`` gates hyphen-tail lemmas like the reference's
    isDomainTerm check."""
    if i1["type"] != i2["type"]:
        return 0.0

    def window_set(inst: dict, start: int, end: int) -> set[str]:
        tokens, _pos, dom = inst["ctx"]
        out: set[str] = set()
        for i in range(start, end + 1):
            if dom[i] is None:
                continue
            word = stem(tokens[i]).lower()
            if "-" in word:
                word = word.rsplit("-", 1)[1]
                if domain is None or not domain.is_domain_term(word):
                    continue
            out.add(word)
        return out

    def window_score(s1: set[str], s2: set[str]) -> float:
        score = 0.0
        for w1 in s1:
            best = 0.0
            for w2 in s2:
                v = sim_map.get((w1, w2) if w1 < w2 else (w2, w1))
                if v is not None and v > best:
                    best = v
            if best < 0.4:
                best = 0.0
            score += best
        m = min(len(s1), len(s2))
        return score / m if m else score

    n1 = len(i1["ctx"][0])
    n2 = len(i2["ctx"][0])
    return (window_score(window_set(i1, 0, i1["e1"]),
                         window_set(i2, 0, i2["e1"]))
            + window_score(window_set(i1, i1["e1"], i1["e2"]),
                           window_set(i2, i2["e1"], i2["e2"]))
            + window_score(window_set(i1, i1["e2"], n1 - 1),
                           window_set(i2, i2["e2"], n2 - 1)))
