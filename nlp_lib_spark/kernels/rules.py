"""RelEx rule-based relation classification (the shipped rule union).

Faithful re-expression of the five rules the reference unions at runtime
(``relx/ppi/RunRelex.getPredictedInteractions``, RunRelex.java:141-153):
RelexRule1, RelexRule2, RelexRule2b, RelexRule3, RelexRule5, plus the shared
machinery of their base class (``relx/ppi/RelexRule.java:24-162``).

Every function is pure over (tokens, pos, domain, DepGraph); rules run
per-sentence inside Arrow UDF batches with zero cross-row dependencies.
Java ``String.matches`` = full match -> ``re.fullmatch``;
``Matcher.find`` -> ``re.search``.
"""

from __future__ import annotations

import re

from nlp_lib_spark.kernels.depgraph import DepGraph, Edge, _pat

# RelexRule1.java:26-28
_R1_PATH = r"dep|agent|.*comp|.*obj|advcl|(inf|part|rc)mod|prep.*|abbrev|parataxis"
_R1_AGENT_NP = r"nn|amod|abbrev"
_R1_TARGET_NP = r"nn|amod|advmod"
_R1_RCHEAD = r"similar|include(s|d)?|members?|identical|involve(s|d)?"
# RelexRule2.java:23-24
_R2_PREP = r"prep_(of|by|to|on|for|in|through|with)"
_R2_NP = r"nn|amod|advmod"
# RelexRule2b.java:19
_R2B_RE = re.compile(r"(PREP|REL|N)+(PREP)(REL|PREP|N)*PROT1(REL|N|PREP|PROT)+PROT2")
# RelexRule3.java:23,47
_R3_REACH = r"agent|prep_(of|by|to|on|for|in|through|with|between)|nn|amod"
# RelexRule5.java:20
_R5_RE = re.compile(r"PROTEIN[0-9]+.*PROTEIN[0-9]+")
_R1_PREP_AGENT_RE = re.compile(r"prep_(of|from|like|including|in)")
_R1_RCHEAD_RE = re.compile(r"similar|include(s|d)?|members?|identical|involve(s|d)?")
_R2B_PREP_WORDS = frozenset(("of", "by", "to", "on", "for", "in", "through", "with"))
_R5_GOV_RELNS = frozenset(("nn", "amod", "abbrev", "appos"))

Pair = tuple[int, int]


class Sent:
    """Per-sentence bundle the rules read (tokens + POS + DOMAIN tags)."""

    __slots__ = ("tokens", "pos", "domain", "_r2b_base")

    def __init__(self, tokens: list[str], pos: list[str],
                 domain: list[str | None]):
        self.tokens = tokens
        self.pos = pos
        self.domain = domain
        self._r2b_base: list[str] | None = None

    def __len__(self) -> int:
        return len(self.tokens)

    def is_protein(self, i: int) -> bool:
        return "PROTEIN" in self.tokens[i]


# ---------------------------------------------------------------- base class
def _add_path(gov: int, g: DepGraph, cur: list[Edge],
              paths: list[list[Edge]], path_pat: str, visited: set[int]) -> None:
    # RelexRule.java:58-76
    if gov in visited:
        return
    visited.add(gov)
    nxt = g.gov_edges(gov, path_pat)
    if not nxt:
        paths.append(list(cur))
    else:
        for e in nxt:
            cur.append(e)
            _add_path(e[2], g, cur, paths, path_pat, visited)
            cur.pop()
    visited.discard(gov)


def _paths_from_src(s: Sent, start: int, start_pat: str, g: DepGraph,
                    path_pat: str) -> list[list[Edge]]:
    # RelexRule.java:24-35 (explores from seed.dep)
    paths: list[list[Edge]] = []
    for seed in g.gov_edges(start, start_pat):
        _add_path(seed[2], g, [seed], paths, path_pat, set())
    return paths


def _all_paths_from_dep(s: Sent, g: DepGraph, start_pat: str,
                        path_pat: str) -> list[list[Edge]]:
    # RelexRule.java:46-56 (explores from seed.dep)
    paths: list[list[Edge]] = []
    for seed in g.edges_matching(start_pat):
        _add_path(seed[2], g, [seed], paths, path_pat, set())
    return paths


def _all_paths_from_gov(s: Sent, g: DepGraph, start_pat: str,
                        path_pat: str) -> list[list[Edge]]:
    # RelexRule1.java:55-68 override (explores from seed.gov)
    paths: list[list[Edge]] = []
    for seed in g.edges_matching(start_pat):
        _add_path(seed[1], g, [seed], paths, path_pat, set())
    return paths


def _head_entity_from_np(head: int, s: Sent, g: DepGraph, pat: str) -> int:
    # RelexRule.java:86-104 — rightmost PROTEIN among head + matching deps
    reachable = [head] + [e[2] for e in g.gov_edges(head, pat)]
    entity = -1
    for p in reachable:
        if s.is_protein(p) and p > entity:
            entity = p
    return entity


def _entities_from_np(head: int, s: Sent, g: DepGraph, pat: str) -> list[int]:
    # RelexRule.java:114-147
    agents: list[int] = []
    agent = _head_entity_from_np(head, s, g, pat)
    if agent != -1:
        agents.append(agent)
        if agent != head:
            for e in g.dep_edges(agent, r"conj.*"):
                nxt = _head_entity_from_np(e[1], s, g, pat)
                if nxt != -1:
                    agents.append(nxt)
    if not agents:
        for e in g.gov_edges(head, r"appos"):
            a = _head_entity_from_np(e[2], s, g, pat)
            if a != -1:
                agents.append(a)
    return agents


def _np_chunk(pos: int, s: Sent, g: DepGraph) -> tuple[int, int]:
    # RelexRule.java:149-162
    es = g.gov_edges(pos, r"nn|amod|advmod") + g.dep_edges(pos, r"nn|amod|advmod")
    lo = hi = pos
    for reln, gv, dp in es:
        lo = min(lo, gv, dp)
        hi = max(hi, gv, dp)
    return lo, hi


# ------------------------------------------------------------------- Rule 1
def _r1_is_negated(g: DepGraph, path: list[Edge], end: int) -> bool:
    # RelexRule1.java:214-226
    for i in range(end + 1):
        _, gov, dep = path[i]
        if g.gov_edges(gov, r"neg") or g.gov_edges(dep, r"neg"):
            return True
    return False


def _r1_chunk_has_domain(s: Sent, chunk: tuple[int, int]) -> bool:
    lo, hi = chunk
    return any(s.domain[i] is not None for i in range(lo, hi + 1))


def _r1_is_domain_specific(s: Sent, g: DepGraph, path: list[Edge], end: int) -> bool:
    # RelexRule1.java:238-256
    for i in range(end + 1):
        _, gov, dep = path[i]
        if s.domain[gov] is not None or s.domain[dep] is not None:
            return True
        if i == 0:
            if _r1_chunk_has_domain(s, _np_chunk(dep, s, g)):
                return True
        else:
            if _r1_chunk_has_domain(s, _np_chunk(gov, s, g)):
                return True
            if i == end:
                if _r1_chunk_has_domain(s, _np_chunk(dep, s, g)):
                    return True
                break
    return False


def _r1_agents(subj: int, s: Sent, g: DepGraph, path: list[Edge]) -> set[int]:
    # RelexRule1.java:104-166
    agents: set[int] = set(_entities_from_np(subj, s, g, _R1_AGENT_NP))

    prep_paths = _paths_from_src(s, subj, r"prep.*|partmod", g,
                                 r"prep.*|agent|dobj|dep")
    for agent in list(agents):
        if agent != subj:
            prep_paths.extend(_paths_from_src(s, agent, r"prep.*|partmod", g,
                                              r"prep.*|agent|dobj"))
    for path2 in prep_paths:
        prep_head = -1
        for reln, gv, dp in path2:
            if _R1_PREP_AGENT_RE.fullmatch(reln):
                prep_head = max(prep_head, dp)
        if prep_head != -1:
            agents.update(_entities_from_np(prep_head, s, g, _R1_AGENT_NP))

    main_head = path[0][1] if path else -1
    for e in g.gov_edges(subj, r"rcmod"):
        dep = e[2]
        rc_head = s.tokens[dep].lower()
        if dep != main_head and _R1_RCHEAD_RE.fullmatch(rc_head):
            for rp in _paths_from_src(s, dep, r".*obj|prep.*", g, r".*obj|prep.*"):
                for t in rp:
                    tmp = _entities_from_np(t[2], s, g, _R1_AGENT_NP)
                    if tmp:
                        agents.update(tmp)
                        break
    return agents


def rule1(s: Sent, g: DepGraph) -> set[Pair]:
    # RelexRule1.findRelations (java:36-39) over nsubj|nsubjpass seeds
    out: set[Pair] = set()
    for path in _all_paths_from_gov(s, g, r"nsubj|nsubjpass", _R1_PATH):
        agents = _r1_agents(path[0][2], s, g, path)
        if not agents:
            continue
        # targets (java:167-193)
        targets: set[Pair] = set()
        for i in range(1, len(path)):
            reln, gv, head = path[i][0], path[i][1], path[i][2]
            if reln == "rcmod":
                rc_head = s.tokens[head].lower()
                if not _R1_RCHEAD_RE.fullmatch(rc_head) and s.domain[head] is None:
                    break
            if not s.pos[head].startswith("NN"):
                continue
            for e in _entities_from_np(head, s, g, _R1_TARGET_NP):
                targets.add((e, i))
        for tgt, idx in targets:
            if _r1_is_domain_specific(s, g, path, idx) and \
               not _r1_is_negated(g, path[:idx + 1], idx):
                for agent in agents:
                    out.add((agent, tgt) if agent < tgt else (tgt, agent))
    return out


# ------------------------------------------------------------------- Rule 2
def _r2_is_domain_specific(s: Sent, g: DepGraph, path: list[Edge]) -> bool:
    # RelexRule2.java:86-122 (note: the else-branch checks token at the
    # *path index* i — a reference quirk we replicate)
    for i, (reln, gov, dep) in enumerate(path):
        gov_pos = s.pos[gov]
        if gov_pos.startswith("N"):
            lo, hi = _np_chunk(gov, s, g)
            for j in range(lo, hi + 1):
                if s.domain[j] is not None:
                    return True
        elif i < len(s.tokens) and s.domain[i] is not None:
            return True
    return False


def rule2(s: Sent, g: DepGraph) -> set[Pair]:
    out: set[Pair] = set()
    for path in _all_paths_from_dep(s, g, _R2_PREP, _R2_PREP):
        for i, (reln, gov, dep) in enumerate(path):
            if not s.pos[gov].startswith("NN") or \
               not s.pos[dep].startswith("NN"):
                continue
            agents = set(_entities_from_np(gov, s, g, _R2_NP))
            targets = set(_entities_from_np(dep, s, g, _R2_NP))
            if not agents or not targets:
                continue
            if not _r2_is_domain_specific(s, g, path[:i + 1]):
                continue
            for a in agents:
                for t in targets:
                    out.add((a, t) if a < t else (t, a))
    return out


# ------------------------------------------------------------------ Rule 2b
def _r2b_base_classes(s: Sent) -> list[str]:
    """Pair-independent token classes for RelexRule2b.getSentPattern
    (RelexRule2b.java:38-64), computed once per sentence — only the two
    entity positions differ per pair, so the O(n) class scan must not
    rerun for each of the O(n^2) candidate pairs."""
    if s._r2b_base is None:
        parts: list[str] = []
        for i in range(len(s.tokens)):
            tok = s.tokens[i]
            if "PROTEIN" in tok:
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
        s._r2b_base = parts
    return s._r2b_base


def _r2b_sent_pattern(s: Sent, e1: int, e2: int) -> str:
    # RelexRule2b.java:38-64
    parts = _r2b_base_classes(s)[:e2 + 1]
    parts[e1] = "PROT1"
    parts[e2] = "PROT2"
    return "".join(parts)


def rule2b(s: Sent, g: DepGraph) -> set[Pair]:
    out: set[Pair] = set()
    n = len(s)
    for i in range(n):
        if not s.is_protein(i):
            continue
        for j in range(i + 1, n):
            if s.is_protein(j) and _R2B_RE.search(_r2b_sent_pattern(s, i, j)):
                out.add((i, j))
    return out


# ------------------------------------------------------------------- Rule 3
def _r3_reachables(s: Sent, g: DepGraph, idx: int, domain_specific: bool,
                   pat: str, visited: set[int], targets: set[int]) -> None:
    # RelexRule3.java:92-108
    if idx in visited:
        return
    visited.add(idx)
    if domain_specific and s.is_protein(idx):
        targets.add(idx)
    if not domain_specific and s.domain[idx] is not None:
        domain_specific = True
    cp = None if pat == "*" else _pat(pat)
    for reln, gv, dp in g.gov_edges(idx):
        if cp is None or cp.fullmatch(reln):
            _r3_reachables(s, g, dp, domain_specific, pat, visited, targets)


def rule3(s: Sent, g: DepGraph) -> set[Pair]:
    out: set[Pair] = set()
    n = len(s)
    # (a) consecutive prep_between on the shortest path (java:27-42,79-89)
    domain_term_pos = -1
    for i in range(n):
        if (i - domain_term_pos) < 5 and s.is_protein(i):
            for j in range(i + 1, n):
                if s.is_protein(j):
                    labels = g.path_labels(i, j)
                    if labels:
                        for k in range(1, len(labels)):
                            if labels[k] in ("prep_between", "-prep_between") and \
                               labels[k - 1] in ("prep_between", "-prep_between"):
                                out.add((i, j))
                                break
        if s.domain[i] is not None:
            domain_term_pos = i
    # (b) domain noun fan-out (java:44-55)
    for i in range(n):
        if s.pos[i].startswith("N") and s.domain[i] is not None:
            targets: set[int] = set()
            _r3_reachables(s, g, i, True, _R3_REACH, set(), targets)
            for e1 in targets:
                for e2 in targets:
                    if e1 < e2 and i < e1:
                        out.add((e1, e2))
    # (c) partmod with DOMAIN dependent (java:57-74)
    for reln, gov, dep in g.edges_matching(r"partmod"):
        if s.domain[dep] is not None:
            tset: set[int] = set()
            _r3_reachables(s, g, dep, True, _R3_REACH, set(), tset)
            aset: set[int] = set()
            _r3_reachables(s, g, gov, True, _R3_REACH, set(), aset)
            for a in aset:
                for t in tset:
                    if a < t:
                        out.add((a, t))
    return out


# ------------------------------------------------------------------- Rule 5
def rule5(s: Sent, g: DepGraph) -> set[Pair]:
    out: set[Pair] = set()
    n = len(s)
    for i in range(n):
        if s.is_protein(i) and i < n - 1:
            if _R5_RE.fullmatch(s.tokens[i]) and s.domain[i + 1] is not None:
                out.add((i, i))
            elif _R5_RE.fullmatch(s.tokens[i]):
                for reln, gov, dep in g.dep_edges(i):
                    if reln in _R5_GOV_RELNS and \
                       s.domain[gov] is not None:
                        out.add((i, i))
                        break
    return out


# ------------------------------------------------- surface form typing
# ppi/RuleExtractor.java:39-43 — the five surface-form patterns over the
# RELV/RELN-distinguished token-class string (getSentPattern, java:236-255).
_FORM1_RE = re.compile(r"PROTEIN[0-9]+.*RELV.*PROTEIN[0-9]+")
_FORM2_RE = re.compile(r"PROTEIN[0-9]+.*REL.*PROTEIN[0-9]+")
_FORM3_RE = re.compile(r"RELN\.PREP.*PROTEIN[0-9]+.*PROTEIN[0-9]+")
_FORM4_RE = re.compile(r"PROTEIN[0-9]+([/-])?PROTEIN[0-9]+")
_FORM5_RE = re.compile(r"PROTEIN[0-9]+.*PROTEIN[0-9]+.*REL")
_FORM3_REACH = r"agent|prep.*|appos|abbrev|nn|amod|dep"


def _form_sent_pattern(s: Sent, e1: int, e2: int) -> str:
    # RuleExtractor.getSentPattern (java:236-255): '.'-joined classes,
    # entity tokens verbatim, DOMAIN tokens as RELV/RELN by POS initial
    parts: list[str] = []
    for i in range(len(s)):
        tok = s.tokens[i]
        if i == e1 or i == e2:
            parts.append(tok)
        elif s.domain[i] is not None:
            parts.append("REL" + (s.pos[i][:1] or "W"))
        elif len(tok) == 1 and tok in "/,-":
            parts.append(tok)
        elif s.pos[i] in ("IN", "TO"):
            parts.append("PREP")
        elif tok in ("and", "or"):
            parts.append("CONJ")
        else:
            parts.append("W")
        parts.append(".")
    return "".join(parts)


def _form_negated(idx: int, g: DepGraph) -> bool:
    return bool(g.gov_edges(idx, r"neg"))


def form_type(tokens: list[str], pos: list[str], domain: list[str | None],
              edges: list[Edge], e1: int, e2: int) -> int:
    """Surface form 1-5 of a candidate pair, -1 when none
    (RuleExtractor.check, java:46-54; first match wins)."""
    s = Sent(tokens, pos, domain)
    g = DepGraph(edges)
    sp = _form_sent_pattern(s, e1, e2)
    path = g.path_edges(e1, e2) if e1 != e2 else None
    # form 1 (java:55-92): verbal REL + subj edge with mid-pair DOMAIN end
    if _FORM1_RE.search(sp) and path is not None:
        for (reln, gov, dep) in path:
            if reln in ("nsubj", "nsubjpass"):
                if _form_negated(gov, g) or _form_negated(dep, g):
                    break
                if e1 < gov < e2 and s.domain[gov] is not None:
                    return 1
                if e1 < dep < e2 and s.domain[dep] is not None:
                    return 1
    # form 2 (java:94-131): relaxed — any REL; flag after subj/rcmod edge
    if _FORM2_RE.search(sp) and path is not None:
        flg = False
        neg = False
        for (reln, gov, dep) in path:
            if reln in ("nsubj", "nsubjpass", "rcmod"):
                flg = True
            if _form_negated(gov, g) or _form_negated(dep, g):
                neg = True
                break
            if flg and e1 < gov < e2 and s.domain[gov] is not None:
                return 2
            if flg and e1 < dep < e2 and s.domain[dep] is not None:
                return 2
        del neg
    # form 3 (java:132-172): nominal REL + PREP, reachability to both
    if _FORM3_RE.search(sp):
        for i in range(e1):
            if s.pos[i].startswith("N") and s.domain[i] is not None:
                targets: set[int] = set()
                _r3_reachables(s, g, i, True, _FORM3_REACH, set(), targets)
                if e1 in targets and e2 in targets:
                    return 3
    # form 4 (java:208-224): fused token with DOMAIN right neighbor
    if e1 == e2 and e1 < len(s) - 1:
        if _FORM4_RE.fullmatch(s.tokens[e1]) and s.domain[e1 + 1] is not None:
            return 4
    # form 5 (java:225-235): trailing REL within 6 tokens of e1
    if _FORM5_RE.search(sp):
        for i in range(e1 + 1, min(len(s), e1 + 6)):
            if s.domain[i] is not None:
                return 5
    return -1


# --------------------------------- candidate generation (experimental path)
# RelCandidateExtractor's own form patterns (ppi/RelCandidateExtractor.java:
# 23-26) — note form5 differs from RuleExtractor's: bounded (W|PREP){0,2}
# between the second entity and the trailing REL.
_RC_FORM1_RE = re.compile(r"PROTEIN[0-9]+.*RELV.*PROTEIN[0-9]+")
_RC_FORM2_RE = re.compile(r"PROTEIN[0-9]+.*REL.*PROTEIN[0-9]+")
_RC_FORM3_RE = re.compile(r"RELN\.PREP.*PROTEIN[0-9]+.*PROTEIN[0-9]+")
_RC_FORM5_RE = re.compile(r"PROTEIN[0-9]+.*PROTEIN[0-9]+\.(W\.|PREP\.){0,2}REL")


def _rc_negated(idx: int, g: DepGraph) -> bool:
    """isNegated (RelCandidateExtractor.java:147-153): any governed edge
    whose reln ends with 'neg'."""
    return any(e[0].endswith("neg") for e in g.gov_edges(idx))


def rel_candidates(tokens: list[str], pos: list[str],
                   domain: list[str | None],
                   edges: list[Edge]) -> set[Pair]:
    """RelCandidateExtractor.applyRule1 (ppi/RelCandidateExtractor.java:
    28-146): seeds = ``rcmod|.*subj|.*subjpass`` edges; *directed* BFS
    reachable sets (depth 100 from the clause side, 10 from the subject
    side — swapped for rcmod seeds); negation-gated; cross pairs checked
    against form1/form2 patterns; same-side pairs admitted by form5
    (set1) / form3 (set2) with a DOMAIN-tagged-LCS requirement."""
    s = Sent(tokens, pos, domain)
    g = DepGraph(edges)
    out: set[Pair] = set()
    for (reln, gov, dep) in g.edges_matching(r"rcmod|.*subj|.*subjpass"):
        if reln == "rcmod":
            if _rc_negated(dep, g):
                continue
            r2 = g.reachable(dep, True, 100) | {dep}
            r1 = g.reachable(gov, True, 10) | {gov}
            set2 = {i for i in r2 if s.is_protein(i)}
            set1 = {i for i in r1 if s.is_protein(i) and i not in set2}
        else:
            if _rc_negated(gov, g):
                continue
            r1 = g.reachable(dep, True, 10) | {dep}
            r2 = g.reachable(gov, True, 100) | {gov}
            set1 = {i for i in r1 if s.is_protein(i)}
            set2 = {i for i in r2 if s.is_protein(i) and i not in set1}
        for a in set1:
            for b in set2:
                i, j = (a, b) if a < b else (b, a)
                sp = _form_sent_pattern(s, i, j)
                if _RC_FORM1_RE.search(sp) or _RC_FORM2_RE.search(sp):
                    out.add((i, j))
        # form5 over subject-side pairs; form3 over clause-side pairs —
        # both require a DOMAIN-tagged LCS (java:110-144)
        for pool, pat in ((set1, _RC_FORM5_RE), (set2, _RC_FORM3_RE)):
            for i in sorted(pool):
                for j in sorted(pool):
                    if i < j and pat.search(_form_sent_pattern(s, i, j)):
                        lcs = g.lcs(i, j)
                        if lcs >= 0 and s.domain[lcs] is not None:
                            out.add((i, j))
    return out


# -------------------------------------------------------------------- union
def predict_interactions(tokens: list[str], pos: list[str],
                         domain: list[str | None],
                         edges: list[Edge]) -> set[Pair]:
    """Union of the five shipped rules (RunRelex.java:141-153)."""
    s = Sent(tokens, pos, domain)
    g = DepGraph(edges)
    out: set[Pair] = set()
    out |= rule1(s, g)
    out |= rule2(s, g)
    out |= rule2b(s, g)
    out |= rule3(s, g)
    out |= rule5(s, g)
    return out


# ----------------------- unshipped experiment rules (completeness port)
# RelexRule4 / RelexRule6 exist in the reference but are NOT wired into the
# shipped union (RunRelex.java:141-153) — predict_interactions deliberately
# excludes them; they are available for experiment parity.
_R6_RE = re.compile(r"PROT1W?(PUNC|CONJ|PROT)+W?PROT2W?REL")


def rule4(s: Sent, g: DepGraph) -> set[Pair]:
    """RelexRule4 (relx/ppi/RelexRule4.java:22-38): protein pairs that are
    dep-disconnected or joined by a single appos/nn hop."""
    out: set[Pair] = set()
    n = len(s)
    for i in range(n):
        if not s.is_protein(i):
            continue
        for j in range(i + 1, n):
            if not s.is_protein(j):
                continue
            labels = g.path_labels(i, j)
            if labels is None:
                out.add((i, j))
            elif len(labels) == 1 and re.fullmatch(r"-?(appos|nn)",
                                                   labels[0]):
                out.add((i, j))
    return out


def _r6_sent_pattern(s: Sent, e1: int, e2: int) -> str:
    # RelexRule6.getSentPattern (java:73-95): full-sentence class string,
    # no '.' separators, PUNC bucket for [/,:;-]
    parts: list[str] = []
    for i in range(len(s)):
        tok = s.tokens[i]
        if i == e1:
            parts.append("PROT1")
        elif i == e2:
            parts.append("PROT2")
        elif "PROTEIN" in tok:
            parts.append("PROT")
        elif s.domain[i] is not None:
            parts.append("REL" + (s.pos[i][:1] or "W"))
        elif re.fullmatch(r"[/,:;-]", tok):
            parts.append("PUNC")
        elif s.pos[i] in ("IN", "TO"):
            parts.append("PREP")
        elif re.fullmatch(r"and|or", tok):
            parts.append("CONJ")
        else:
            parts.append("W")
    return "".join(parts)


def rule6(s: Sent, g: DepGraph) -> set[Pair]:
    """RelexRule6 (relx/ppi/RelexRule6.java:26-46): close pairs sharing a
    DOMAIN-tagged non-negated subject governor, plus the coordinated-list
    surface pattern ``PROT1 .. PROT2 .. REL``."""
    out: set[Pair] = set()
    n = len(s)

    def gov_set(idx: int) -> set[int]:
        return {gv for (reln, gv, dp) in g.dep_edges(idx, r"nsubj|nsubjpass")}

    def negated(idx: int) -> bool:
        return any(e[0].endswith("neg") for e in g.gov_edges(idx))

    for i in range(n):
        if not s.is_protein(i):
            continue
        set_i = gov_set(i)
        for j in range(i + 1, n):
            if not s.is_protein(j):
                continue
            set_j = gov_set(j)
            shared = any(v in set_i and s.domain[v] is not None
                         and not negated(v) for v in set_j)
            if shared and (j - i) < 5:
                out.add((i, j))
            if _R6_RE.search(_r6_sent_pattern(s, i, j)):
                out.add((i, j))
    return out


# ------------------- ppi candidate-rule experiments (completeness port)
# ppi/Rule1-3 implement the ppi.Rule interface (ppi/Rule.java:18) --
# candidate-pair generators predating RelCandidateExtractor; like
# RelexRule4/6 they are not wired into any shipped entry point.  The
# reference passes (depGraph, ccDepGraph); the frozen builder emits one
# CC-distributed graph, so the port takes a single ``g`` for both slots.
_P1_SEED = r".*subj|.*subjpass|rcmod"
_P1_AGENT_RCMOD = r"nn|amod|appos|conj.*|prep.*|dobj|dep|abbrev"
_P1_AGENT_SUBJ = _P1_AGENT_RCMOD + r"|partmod"
_P2_REACH = r"agent|prep.*|appos|abbrev|nn|amod|dep"


def _inside_domain_phrase(s: Sent, g: DepGraph, i: int,
                          include_self: bool = True) -> bool:
    """insideDomainPhrase (ppi/Rule2.java:59-74 / Rule3.java:57-72): DOMAIN
    on the token itself (Rule2/3 only), any governed dependent, or any
    governor."""
    if include_self and s.domain[i] is not None:
        return True
    if any(s.domain[e[2]] is not None for e in g.gov_edges(i)):
        return True
    return any(s.domain[e[1]] is not None for e in g.dep_edges(i))


def _p1_negated(g: DepGraph, i: int) -> bool:
    return any(e[0].endswith("neg") for e in g.gov_edges(i))


def _p1_targets(s: Sent, g: DepGraph, out: set[int], idx: int,
                visited: list[bool], filter_reln: str) -> None:
    """getTargets (ppi/Rule1.java:66-83): DFS over governed edges whose
    reln does NOT match ``filter_reln``; collect PROTEIN tokens.  The
    domainSpecific gate is commented out in the reference and therefore
    dead; ported as-is."""
    if visited[idx]:
        return
    visited[idx] = True
    if s.is_protein(idx):
        out.add(idx)
    for (reln, _gov, dep) in g.gov_edges(idx):
        if not re.fullmatch(filter_reln, reln):
            _p1_targets(s, g, out, dep, visited, filter_reln)


def _p1_agents(s: Sent, g: DepGraph, out: set[int], idx: int,
               visited: list[bool], reln_pat: str) -> None:
    """getAgents (ppi/Rule1.java:85-103): DFS over governed edges matching
    ``reln_pat``, plus climbing INCOMING abbrev|appos|conj.* edges (the
    head of a coordination list is the first conjunct)."""
    if visited[idx]:
        return
    visited[idx] = True
    if s.is_protein(idx):
        out.add(idx)
    for (reln, _gov, dep) in g.gov_edges(idx):
        if re.fullmatch(reln_pat, reln):
            _p1_agents(s, g, out, dep, visited, reln_pat)
    for (_reln, gov, _dep) in g.dep_edges(idx, r"abbrev|appos|conj.*"):
        _p1_agents(s, g, out, gov, visited, reln_pat)


def rule_p1(s: Sent, g: DepGraph) -> set[Pair]:
    """ppi.Rule1 (ppi/Rule1.java:24-64): subj/rcmod-seeded agent x target
    candidates with negation-free seeds, the subject subtree masked out of
    the target walk, and min/max pair normalization."""
    out: set[Pair] = set()
    for (reln, gov, dep) in g.edges_matching(_P1_SEED):
        if _p1_negated(g, gov) or _p1_negated(g, dep):
            continue
        agents: set[int] = set()
        targets: set[int] = set()
        visited = [False] * len(s)
        if not re.fullmatch(r"nsubj|nsubjpass", reln):
            _p1_targets(s, g, targets, dep, visited, "NONE")
            _p1_agents(s, g, agents, gov, visited, _P1_AGENT_RCMOD)
        else:
            ri = g.reachable(dep, True, 100) | {dep}
            for r in ri:
                visited[r] = True
            _p1_targets(s, g, targets, gov, visited, "NONE")
            for r in ri:
                visited[r] = False
            visited[dep] = False
            _p1_agents(s, g, agents, dep, visited, _P1_AGENT_SUBJ)
        for a in agents:
            for t in targets:
                out.add((min(a, t), max(a, t)))
    return out


def _p2_reachables(s: Sent, g: DepGraph, out: set[int], idx: int,
                   visited: list[bool]) -> None:
    # getReachables (ppi/Rule2.java:41-57); domainSpecific accumulator dead
    if visited[idx]:
        return
    visited[idx] = True
    if s.is_protein(idx):
        out.add(idx)
    for (reln, _gov, dep) in g.gov_edges(idx):
        if re.fullmatch(_P2_REACH, reln):
            _p2_reachables(s, g, out, dep, visited)


def rule_p2(s: Sent, g: DepGraph) -> set[Pair]:
    """ppi.Rule2 (ppi/Rule2.java:20-39): from every DOMAIN-adjacent or
    PROTEIN token, all ordered pairs among the proteins reachable over
    agent|prep.*|appos|abbrev|nn|amod|dep."""
    out: set[Pair] = set()
    for i in range(len(s)):
        if _inside_domain_phrase(s, g, i) or s.is_protein(i):
            reach: set[int] = set()
            _p2_reachables(s, g, reach, i, [False] * len(s))
            for e1 in reach:
                for e2 in reach:
                    if e1 < e2:
                        out.add((e1, e2))
    return out


def _p3_path_labels(g: DepGraph, src: int, dst: int) -> list[str] | None:
    """Verbatim getPathAsList BFS (SimpleDepGraph.java:420-481).  Unlike
    DepGraph.path_labels (first-parent BFS shared by the shipped rules),
    this walk has NO marked array: a frontier node's parent is overwritten
    by the LAST same-level toucher before its dequeue, so equal-length
    path ties resolve differently — rule_p3's consecutive-label test is
    sensitive to which shortest path comes back, hence the faithful
    replica here (O(V+E) via sorted adjacency standing in for the
    reference's ascending matrix sweep)."""
    from collections import deque
    size = 0
    nbrs: dict[int, set[int]] = {}
    lab: dict[tuple[int, int], str] = {}
    for (reln, gv, dp) in g.edges:
        size = max(size, gv, dp)
        lab[(gv, dp)] = reln          # matrix semantics: last edge wins
        lab[(dp, gv)] = "-" + reln
        nbrs.setdefault(gv, set()).add(dp)
        nbrs.setdefault(dp, set()).add(gv)
    if src > size or dst > size:
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
        for i in sorted(nbrs.get(v, ())):
            if not visited[i]:
                parent[i] = v + 1
                q.append(i)
    if parent[dst] == 0:
        return None
    out: list[str] = []
    v = dst
    while v != src:
        p = parent[v] - 1
        out.append(lab[(p, v)])
        v = p
    out.reverse()
    return out


def rule_p3(s: Sent, g: DepGraph) -> set[Pair]:
    """ppi.Rule3 (ppi/Rule3.java:21-55): protein pairs whose undirected
    dep path carries two consecutive ``-?prep_between`` labels (the
    domain accumulator along the path is dead code in the reference)."""
    out: set[Pair] = set()
    n = len(s)
    for i in range(n):
        if not s.is_protein(i):
            continue
        for j in range(i + 1, n):
            if not s.is_protein(j):
                continue
            labels = _p3_path_labels(g, i, j)
            if not labels:
                continue
            for k in range(1, len(labels)):
                if re.fullmatch(r"-?prep_between", labels[k]) and \
                        re.fullmatch(r"-?prep_between", labels[k - 1]):
                    out.add((i, j))
                    break
    return out
