"""Legacy relx rule experiments (relx/Rule1.java, Rule2.java, Rule4.java).

Development-stage precursors of the shipped RelexRule family, operating over
the LLL annotation bundle (tokens + POS + LEXE lexicon tags + dep graph +
restriction terms).  None are wired into a shipped entry point (their only
caller is ``relx/Rule1.main``'s interactive REPL); ported for experiment
parity like ``kernels/rules.rule4/rule6``.

Base machinery is ``relx/Rule.java:29-192``: terminal-path DFS
(``addPath``), rightmost-LEXE NP-head resolution (``getHeadEntityFromNP``),
conjunct/appositive expansion (``getEntitiesFromNP``), and edge-derived NP
chunk bounds (``getNPChunk``).  Java ``String.matches`` = full match ->
``re.fullmatch``.
"""

from __future__ import annotations

import re

from nlp_lib_spark.kernels.depgraph import DepGraph, Edge

Pair = tuple[int, int]

# relx/Rule1.java:33-43
_X1_PATH = r"dep|agent|.*comp|.*obj|advcl|(inf|part|rc)mod|prep.*"
_X1_AGENT_NP = r"nn|amod"
_X1_TARGET_NP = r"nn|amod|advmod"
_X1_P1 = re.compile(
    r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\s(via|after|with|if|once|requires"
    r"|require|when|through|due to|in case|provided that|effect of|result of"
    r"|member of|in response to"
    r"|under.*<<NN.*control|under( the)? control of"
    r"|depend(s|ed|ent)? ([a-z]+)? on).*")
_X1_P2 = re.compile(r".*(requires|belongs? to|require"
                    r"|depend(s|ed|ent)? (on|upon)).*")
_X1_P3 = re.compile(r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\sby.*")
_X1_P4 = re.compile(
    r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\sby.*(time|times|fold|(ing<<VB)).*")
_X1_NOMARK = re.compile(
    r"belong(s|ed)?|requires?|effect|provided|effect|result|member|response"
    r"|control|depend(s|ed|ent)?")
_X1_RCHEAD = re.compile(r"similar|include(s|d)?|members?|identical"
                        r"|involve(s|d)?")
_X1_PREP_AGENT = re.compile(r"prep_(of|from|like|including|in)")
# relx/Rule2.java:22-23
_X2_SEED = r"prep.(of|by|to|on|for|in|through|with)"
_X2_NP = r"nn|amod|advmod"
_VNJ = re.compile(r"(VB|NN|JJ).*")


class XSent:
    """Token/POS/LEXE bundle the relx rules read."""

    __slots__ = ("tokens", "pos", "lexe")

    def __init__(self, tokens: list[str], pos: list[str], lexe: list[str]):
        self.tokens = tokens
        self.pos = pos
        self.lexe = lexe

    def __len__(self) -> int:
        return len(self.tokens)


# --------------------------------------------------- Rule.java base helpers
def _add_path(gov: int, g: DepGraph, cur: list[Edge],
              paths: list[list[Edge]], path_pat: str,
              visited: list[bool]) -> None:
    """addPath (Rule.java:65-83): record only TERMINAL paths (no matching
    continuation); per-path visited mark/unmark."""
    if visited[gov]:
        return
    visited[gov] = True
    deps = g.gov_edges(gov, path_pat)
    if not deps:
        paths.append(list(cur))
    else:
        for e in deps:
            cur.append(e)
            _add_path(e[2], g, cur, paths, path_pat, visited)
            cur.pop()
    visited[gov] = False


def paths_frm_src(s: XSent, start: int, start_pat: str, g: DepGraph,
                  path_pat: str) -> list[list[Edge]]:
    """getPathsFrmSrc (Rule.java:31-42): seeds from ``start``'s governed
    edges; explore from each seed's dependent."""
    paths: list[list[Edge]] = []
    for seed in g.gov_edges(start, start_pat):
        _add_path(seed[2], g, [seed], paths, path_pat, [False] * len(s))
    return paths


def all_paths(s: XSent, g: DepGraph, start_pat: str, path_pat: str,
              from_gov: bool = False) -> list[list[Edge]]:
    """getAllPaths (Rule.java:53-64; Rule1's override explores from the
    seed's GOVERNOR instead of its dependent, Rule1.java:70-84)."""
    paths: list[list[Edge]] = []
    for seed in g.edges_matching(start_pat):
        start = seed[1] if from_gov else seed[2]
        _add_path(start, g, [seed], paths, path_pat, [False] * len(s))
    return paths


def head_entity_from_np(head: int, s: XSent, g: DepGraph,
                        pat: str) -> int:
    """getHeadEntityFromNP (Rule.java:93-113): rightmost LEXE-B among the
    head and its pattern-matching dependents; -1 if none."""
    reach = [head] + [e[2] for e in g.gov_edges(head, pat)]
    ent = -1
    for p in reach:
        if s.lexe[p] == "B" and p > ent:
            ent = p
    return ent


def entities_from_np(head: int, s: XSent, g: DepGraph,
                     pat: str) -> list[int]:
    """getEntitiesFromNP (Rule.java:122-153): head entity, coordination
    expansion via INCOMING conj.* when the entity differs from the head,
    appositive fallback when empty."""
    agents: list[int] = []
    agent = head_entity_from_np(head, s, g, pat)
    if agent != -1:
        agents.append(agent)
        if agent != head:
            for (_r, gov, _d) in g.dep_edges(agent, r"conj.*"):
                nxt = head_entity_from_np(gov, s, g, pat)
                if nxt != -1:
                    agents.append(nxt)
    if not agents:
        for (_r, _g, dep) in g.gov_edges(head, r"appos"):
            a = head_entity_from_np(dep, s, g, pat)
            if a != -1:
                agents.append(a)
    return agents


def np_chunk(pos: int, g: DepGraph) -> Pair:
    """getNPChunk (Rule.java:155-168): min/max token bounds over
    nn|amod|advmod edges touching ``pos``."""
    es = g.gov_edges(pos, r"nn|amod|advmod") + g.dep_edges(pos,
                                                           r"nn|amod|advmod")
    lo = hi = pos
    for (_r, gv, dp) in es:
        lo = min(lo, gv, dp)
        hi = max(hi, gv, dp)
    return lo, hi


def _chunk_str_plain(chunk: Pair, s: XSent) -> str:
    # Rule.java:170-176
    return "".join(s.tokens[j] + " " for j in range(chunk[0], chunk[1] + 1))


def _chunk_str_marked(chunk: Pair, s: XSent) -> str:
    # Rule1.java getChunkStr override (:229-239): <<POS markers on
    # unsuppressed VB/NN/JJ tokens
    parts: list[str] = []
    for j in range(chunk[0], chunk[1] + 1):
        if _VNJ.fullmatch(s.pos[j]) and not _X1_NOMARK.fullmatch(s.tokens[j]):
            parts.append(s.tokens[j] + "<<" + s.pos[j] + " ")
        else:
            parts.append(s.tokens[j] + " ")
    return "".join(parts)


# ------------------------------------------------------------- relx.Rule1
def _x1_agents(subj: int, s: XSent, g: DepGraph,
               path: list[Edge]) -> set[int]:
    """Rule1.getAgents (:145-200): subject NP + PP-chain heads + qualifying
    rcmod clauses."""
    agents: set[int] = set(entities_from_np(subj, s, g, _X1_AGENT_NP))
    for p in paths_frm_src(s, subj, r"prep.*|partmod", g,
                           r"prep.*|agent|dobj"):
        prep_head = -1
        for (reln, _g, dep) in p:
            if _X1_PREP_AGENT.fullmatch(reln):
                prep_head = max(prep_head, dep)
        if prep_head != -1:
            agents.update(entities_from_np(prep_head, s, g, _X1_AGENT_NP))
    main_head = path[0][1] if path else -1
    for (_r, _g2, dep) in g.gov_edges(subj, r"rcmod"):
        if dep != main_head and _X1_RCHEAD.fullmatch(s.tokens[dep].lower()):
            for p in paths_frm_src(s, dep, r".*obj|prep.*", g,
                                   r".*obj|prep.*"):
                for (_r2, _g3, head) in p:
                    tmp = entities_from_np(head, s, g, _X1_AGENT_NP)
                    if tmp:
                        agents.update(tmp)
                        break  # reference: "arbitrary decision"
    return agents


def _x1_targets(s: XSent, g: DepGraph,
                path: list[Edge]) -> set[tuple[int, int]]:
    """Rule1.getTargets (:202-227): NN-headed path nodes (with end index),
    rcmod tail cutoff."""
    targets: set[tuple[int, int]] = set()
    for i in range(1, len(path)):
        reln, _gv, head = path[i]
        if re.fullmatch(r"rcmod", reln) and \
                not _X1_RCHEAD.fullmatch(s.tokens[head].lower()):
            break
        if not s.pos[head].startswith("NN"):
            continue
        for e in entities_from_np(head, s, g, _X1_TARGET_NP):
            targets.add((e, i))
    return targets


def _x1_path_str(s: XSent, g: DepGraph, path: list[Edge],
                 end: int) -> str:
    # Rule1.checkRoleOrder (:241-276) surface string
    sb: list[str] = []
    for i in range(end + 1):
        reln, gov, dep = path[i]
        if i == 0:
            sb.append(_chunk_str_marked(np_chunk(dep, g), s))
            sb.append(" ")
            continue
        if s.pos[gov].startswith("NN"):
            sb.append(_chunk_str_marked(np_chunk(gov, g), s))
        elif re.fullmatch(r"(VB|JJ).*", s.pos[gov]) and \
                not _X1_NOMARK.fullmatch(s.tokens[gov]):
            sb.append(s.tokens[gov] + "<<" + s.pos[gov] + " ")
        else:
            sb.append(s.tokens[gov] + " ")
        if re.fullmatch(r"prep_.*", reln):
            sb.append(reln[reln.index("_") + 1:] + " ")
        elif reln == "agent":
            sb.append("by ")
        if i == end:
            if s.pos[dep].startswith("NN"):
                sb.append(_chunk_str_marked(np_chunk(dep, g), s))
            else:
                sb.append(s.tokens[dep] + " ")
            break
    return "".join(sb)


def _x1_role_order_ok(s: XSent, g: DepGraph, path: list[Edge],
                      end: int) -> bool:
    ps = _x1_path_str(s, g, path, end)
    if _X1_P1.fullmatch(ps) or _X1_P2.fullmatch(ps):
        return False
    if _X1_P3.fullmatch(ps) and not _X1_P4.fullmatch(ps):
        return False
    return True


def _x1_negated(g: DepGraph, path: list[Edge], end: int) -> bool:
    # Rule1.isNegated (:300-312)
    for i in range(end + 1):
        _r, gov, dep = path[i]
        if g.gov_edges(gov, r"neg") or g.gov_edges(dep, r"neg"):
            return True
    return False


def _x1_domain_chunk(s: XSent, chunk: Pair,
                     restriction: frozenset[str]) -> bool:
    return any(s.tokens[i].lower() in restriction
               for i in range(chunk[0], chunk[1] + 1))


def _x1_domain(s: XSent, g: DepGraph, path: list[Edge], end: int,
               restriction: frozenset[str]) -> bool:
    # Rule1.isDomainSpecific (:321-338)
    for i in range(end + 1):
        _r, gov, dep = path[i]
        if i == 0:
            if _x1_domain_chunk(s, np_chunk(dep, g), restriction):
                return True
        else:
            if _x1_domain_chunk(s, np_chunk(gov, g), restriction):
                return True
            if i == end:
                if _x1_domain_chunk(s, np_chunk(dep, g), restriction):
                    return True
                break
    return False


def relx_rule1(s: XSent, g: DepGraph,
               restriction: frozenset[str]) -> list[Pair]:
    """relx.Rule1 (Rule1.java:51-143): subj-seeded terminal paths explored
    from the governor; agents from the subject NP/PP/rcmod; NN-headed path
    targets gated on domain-specificity, negation, and the passive
    role-order surface patterns."""
    out: list[Pair] = []
    for path in all_paths(s, g, r"nsubj|nsubjpass", _X1_PATH, from_gov=True):
        agents = _x1_agents(path[0][2], s, g, path)
        if not agents:
            continue
        for (target, end) in sorted(_x1_targets(s, g, path)):
            if _x1_domain(s, g, path, end, restriction) and \
                    not _x1_negated(g, path, end):
                if _x1_role_order_ok(s, g, path, end):
                    out.extend((a, target) for a in sorted(agents))
                else:
                    out.extend((target, a) for a in sorted(agents))
    return out


# ------------------------------------------------------------- relx.Rule2
def _x2_domain(s: XSent, g: DepGraph, sub: list[Edge],
               restriction: frozenset[str]) -> bool:
    # Rule2.isDomainSpecific (:88-113): NN governors contribute their NP
    # chunk split on [-\\s]+; other governors their own word
    for (_r, gov, _d) in sub:
        if s.pos[gov].startswith("NN"):
            chunk_tokens = re.split(
                r"[-\s]+", _chunk_str_plain(np_chunk(gov, g), s))
            if any(t.lower() in restriction for t in chunk_tokens):
                return True
        elif s.tokens[gov].lower() in restriction:
            return True
    return False


def relx_rule2(s: XSent, g: DepGraph,
               restriction: frozenset[str]) -> list[Pair]:
    """relx.Rule2 (Rule2.java:30-85): prep-chain terminal paths; per NN-NN
    edge, NP entities at both ends, domain gate on the path prefix,
    prep_by swaps agent/target."""
    out: list[Pair] = []
    for path in all_paths(s, g, _X2_SEED, _X2_SEED):
        for i, (reln, gov, dep) in enumerate(path):
            if not (s.pos[gov].startswith("NN")
                    and s.pos[dep].startswith("NN")):
                continue
            agents = set(entities_from_np(gov, s, g, _X2_NP))
            targets = set(entities_from_np(dep, s, g, _X2_NP))
            if not agents or not targets:
                continue
            if not _x2_domain(s, g, path[:i + 1], restriction):
                continue
            for a in sorted(agents):
                for t in sorted(targets):
                    out.append((t, a) if reln.endswith("by") else (a, t))
    return out


# ------------------------------------------------------------- relx.Rule4
def relx_rule4(s: XSent, g: DepGraph) -> list[Pair]:
    """relx.Rule4 (Rule4.java:18-37): ``X-dependent`` LEXE-B amod modifiers
    paired with the entities of their governing NP."""
    out: list[Pair] = []
    for (_r, gov, dep) in g.edges_matching(r"amod"):
        if s.lexe[dep] == "B" and s.tokens[dep].endswith("-dependent"):
            for e in entities_from_np(gov, s, g, r"nn|amod"):
                out.append((dep, e))
    return out
