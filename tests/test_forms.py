"""Surface-form typing (RuleExtractor forms 1-5) + RelCandidateExtractor."""

from __future__ import annotations

from nlp_lib_spark.kernels.depparse import dep_parse
from nlp_lib_spark.kernels.domain import DomainAnnotator
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.rules import form_type, rel_candidates
from nlp_lib_spark.kernels.stem import stem


def _setup(toks, terms):
    d = DomainAnnotator(terms)
    pos = pos_tag(toks, frozenset(stem(t) for t in terms))
    dom = d.tag(toks)
    return toks, pos, dom, dep_parse(toks, pos)


def test_form1_verbal_svo():
    t = _setup(["PROTEIN0", "interacts", "with", "PROTEIN1", "."],
               ["interact"])
    assert form_type(*t, 0, 3) == 1


def test_form1_negation_falls_through():
    t = _setup(["PROTEIN0", "does", "not", "interact", "with", "PROTEIN1", "."],
               ["interact"])
    assert form_type(*t, 0, 5) != 1


def test_form3_nominal_prep():
    t = _setup(["interaction", "of", "PROTEIN0", "with", "PROTEIN1", "."],
               ["interaction", "interact"])
    assert form_type(*t, 2, 4) == 3


def test_form4_fused():
    t = _setup(["the", "PROTEIN0/PROTEIN1", "interaction", "."],
               ["interaction", "interact"])
    assert form_type(*t, 1, 1) == 4


def test_form5_trailing_rel():
    t = _setup(["PROTEIN0", "and", "PROTEIN1", "binding", "was", "strong", "."],
               ["bind", "binding"])
    assert form_type(*t, 0, 2) == 5


def test_form_none():
    t = _setup(["PROTEIN0", "near", "PROTEIN1", "."], ["interact"])
    assert form_type(*t, 0, 2) == -1


def test_rel_candidates_subj_seed():
    t = _setup(["PROTEIN0", "interacts", "with", "PROTEIN1", "."],
               ["interact"])
    assert rel_candidates(*t) == {(0, 3)}


def test_rel_candidates_empty_without_seed():
    t = _setup(["of", "PROTEIN0", "PROTEIN1", "."], ["interact"])
    assert rel_candidates(*t) == set()


def test_rule2b_matches_verbatim_reference_scan():
    """Seeded fuzz: the cached-base rule2b equals a verbatim port of
    RelexRule2b.getSentPattern + findRelations (java:21-63, note the
    commented-out '.' separator — the class string is concatenated)."""
    import random

    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import (_R2B_PREP_WORDS, _R2B_RE, Sent,
                                             rule2b)

    def naive_pattern(s, e1, e2):
        parts = []
        for i in range(e2 + 1):
            tok = s.tokens[i]
            if i == e1:
                parts.append("PROT1")
            elif i == e2:
                parts.append("PROT2")
            elif "PROTEIN" in tok:
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
        return "".join(parts)

    rng = random.Random(7)
    vocab = ["PROTEIN0", "PROTEIN1", "PROTEIN2", "binds", "with", "of",
             "and", "/", ",", "-", "the", "run", "data", "quickly"]
    pos_of = {"PROTEIN0": "NN", "PROTEIN1": "NN", "PROTEIN2": "NN",
              "binds": "VBZ", "with": "IN", "of": "IN", "and": "CC",
              "/": "/", ",": ",", "-": "-", "the": "DT", "run": "NN",
              "data": "NNS", "quickly": "RB"}
    for _ in range(800):
        n = rng.randint(2, 14)
        toks = [rng.choice(vocab) for _ in range(n)]
        pos = [pos_of[t] for t in toks]
        dom = ["bind" if t == "binds" else None for t in toks]
        s = Sent(toks, pos, dom)
        got = rule2b(s, DepGraph([]))
        exp = {(i, j)
               for i in range(n) if "PROTEIN" in toks[i]
               for j in range(i + 1, n) if "PROTEIN" in toks[j]
               and _R2B_RE.search(naive_pattern(Sent(toks, pos, dom), i, j))}
        assert got == exp, (toks, got, exp)


def test_rule1_matches_verbatim_reference():
    """Seeded fuzz: rule1 equals an independent verbatim transliteration
    of RelexRule1 + the RelexRule base machinery (relx/ppi/RelexRule1.java
    :26-289, RelexRule.java:24-162): path DFS from nsubj governors, PP and
    rcmod agent expansion, NN-headed targets with the rcmod tail filter,
    NP-chunk DOMAIN checks, and negation gating."""
    import random
    import re

    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import Sent, rule1

    PATH_P = re.compile(r"dep|agent|.*comp|.*obj|advcl|(inf|part|rc)mod|prep.*|abbrev|parataxis")
    AGENT_NP = re.compile(r"nn|amod|abbrev")
    TARGET_NP = re.compile(r"nn|amod|advmod")
    RCHEAD = re.compile(r"similar|include(s|d)?|members?|identical|involve(s|d)?")

    class G:
        def __init__(self, edges):
            self.edges = list(edges)
        def gov_deps(self, gov, pat=None):
            return [e for e in self.edges if e[1] == gov and (pat is None or pat.fullmatch(e[0]))]
        def dep_deps(self, dep, pat=None):
            return [e for e in self.edges if e[2] == dep and (pat is None or pat.fullmatch(e[0]))]
        def matching(self, pat):
            p = re.compile(pat)
            return [e for e in self.edges if p.fullmatch(e[0])]

    def add_path(gov, g, cur, paths, pat, visited):
        if visited[gov]: return
        visited[gov] = True
        deps = g.gov_deps(gov, pat)
        if not deps:
            paths.append(list(cur))
        else:
            for sd in deps:
                cur.append(sd)
                add_path(sd[2], g, cur, paths, pat, visited)
                cur.pop()
        visited[gov] = False

    def get_all_paths_gov(n, g, start_pat, path_pat):
        paths = []
        for seed in g.matching(start_pat):
            add_path(seed[1], g, [seed], paths, path_pat, [False]*n)
        return paths

    def paths_frm_src(n, start, start_pat, g, path_pat):
        paths = []
        for seed in g.gov_deps(start, start_pat):
            add_path(seed[2], g, [seed], paths, path_pat, [False]*n)
        return paths

    def head_entity_from_np(head, toks, g, pat):
        reach = [head] + [e[2] for e in g.gov_deps(head, pat)]
        ent = -1
        for p in reach:
            if "PROTEIN" in toks[p] and p > ent:
                ent = p
        return ent

    def entities_from_np(head, toks, g, pat):
        agents = []
        agent = head_entity_from_np(head, toks, g, pat)
        if agent != -1:
            agents.append(agent)
            if agent != head:
                for sd in g.dep_deps(agent, re.compile("conj.*")):
                    nxt = head_entity_from_np(sd[1], toks, g, pat)
                    if nxt != -1:
                        agents.append(nxt)
        if not agents:
            for sd in g.gov_deps(head, re.compile("appos")):
                a = head_entity_from_np(sd[2], toks, g, pat)
                if a != -1:
                    agents.append(a)
        return agents

    def np_chunk(pos_i, g):
        deps = g.gov_deps(pos_i, re.compile("nn|amod|advmod")) + g.dep_deps(pos_i, re.compile("nn|amod|advmod"))
        lo = hi = pos_i
        for sd in deps:
            lo = min(lo, sd[1], sd[2]); hi = max(hi, sd[1], sd[2])
        return (lo, hi)

    def get_agents(subj, toks, g, cand_path, n):
        agents = set(entities_from_np(subj, toks, g, AGENT_NP))
        prep_paths = paths_frm_src(n, subj, re.compile("prep.*|partmod"), g, re.compile("prep.*|agent|dobj|dep"))
        for agent in list(agents):
            if agent != subj:
                prep_paths.extend(paths_frm_src(n, agent, re.compile("prep.*|partmod"), g, re.compile("prep.*|agent|dobj")))
        for path in prep_paths:
            prep_head = -1
            for sd in path:
                if re.fullmatch(r"prep_(of|from|like|including|in)", sd[0]):
                    prep_head = max(prep_head, sd[2])
            if prep_head != -1:
                agents.update(entities_from_np(prep_head, toks, g, AGENT_NP))
        main_head = cand_path[0][1] if cand_path else -1
        rcmod_agents = []
        for sd in g.gov_deps(subj, re.compile("rcmod")):
            dep = sd[2]
            rc_head = toks[dep].lower()
            if dep != main_head and RCHEAD.fullmatch(rc_head):
                for path in paths_frm_src(n, dep, re.compile(".*obj|prep.*"), g, re.compile(".*obj|prep.*")):
                    for td in path:
                        tmp = entities_from_np(td[2], toks, g, AGENT_NP)
                        if tmp:
                            rcmod_agents.extend(tmp)
                            break
        agents.update(rcmod_agents)
        return agents

    def get_targets(toks, pos, domain, g, cand_path):
        targets = set()
        for i in range(1, len(cand_path)):
            head = cand_path[i][2]
            reln = cand_path[i][0]
            if re.fullmatch("rcmod", reln):
                rc_head = toks[head].lower()
                if not RCHEAD.fullmatch(rc_head) and domain[head] is None:
                    break
            if not pos[head].startswith("NN"):
                continue
            for e in entities_from_np(head, toks, g, TARGET_NP):
                targets.add((e, i))
        return targets

    def is_negated(g, path, end):
        for i in range(end + 1):
            gov, dep = path[i][1], path[i][2]
            if g.gov_deps(gov, re.compile("neg")) or g.gov_deps(dep, re.compile("neg")):
                return True
        return False

    def chunk_dom(domain, chunk):
        lo, hi = chunk
        return any(domain[i] is not None for i in range(lo, hi + 1))

    def is_domain_specific(toks, domain, g, path, end):
        for i in range(end + 1):
            gov, dep = path[i][1], path[i][2]
            if domain[gov] is not None or domain[dep] is not None:
                return True
            if i == 0:
                if chunk_dom(domain, np_chunk(dep, g)): return True
            else:
                if chunk_dom(domain, np_chunk(gov, g)): return True
                if i == end:
                    if chunk_dom(domain, np_chunk(dep, g)): return True
                    break
        return False

    def reference_rule1(toks, pos, domain, edges):
        n = len(toks)
        g = G(edges)
        relations = set()
        for path in get_all_paths_gov(n, g, r"nsubj|nsubjpass", PATH_P):
            agents = get_agents(path[0][2], toks, g, path, n)
            if not agents: continue
            for (tgt, idx) in get_targets(toks, pos, domain, g, path):
                if is_domain_specific(toks, domain, g, path, idx) and not is_negated(g, path, idx):
                    for agent in agents:
                        relations.add((agent, tgt) if agent < tgt else (tgt, agent))
        return relations

    rng = random.Random(31)
    relns = ["nsubj", "nsubjpass", "dobj", "prep_of", "prep_between", "nn",
             "amod", "rcmod", "conj_and", "appos", "neg", "advmod",
             "partmod", "agent", "xcomp"]
    vocab = ["PROTEIN0", "PROTEIN1", "PROTEIN2", "binds", "includes",
             "similar", "x", "data"]
    pos_of = {"PROTEIN0": "NN", "PROTEIN1": "NN", "PROTEIN2": "NNS",
              "binds": "VBZ", "includes": "VBZ", "similar": "JJ",
              "x": "DT", "data": "NN"}
    for _ in range(600):
        n = rng.randint(2, 8)
        toks = [rng.choice(vocab) for _ in range(n)]
        pos = [pos_of[w] for w in toks]
        dom = ["bind" if rng.random() < 0.25 else None for _ in range(n)]
        edges = []
        for _ in range(rng.randint(0, 8)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.append((rng.choice(relns), a, b))
        s = Sent(toks, pos, dom)
        got = rule1(s, DepGraph(edges))
        exp = reference_rule1(toks, pos, dom, edges)
        assert got == exp, (toks, pos, dom, edges, got, exp)


def test_rule3_matches_verbatim_reference():
    """Seeded fuzz: rule3 equals a verbatim transliteration of
    RelexRule3.findRelations (java:21-107): the domain-window
    prep_between adjacency check over the undirected path-label list,
    DOMAIN-noun fan-out over the reachability DFS, and the partmod
    branch.  (Parallel edges between one (gov, dep) pair are excluded:
    the reference's adjacency matrix keeps the last insertion while our
    edge list keeps all — an untriggered artifact on real parses.)"""
    import random
    import re
    from collections import deque

    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import Sent, rule3

    REACH = "agent|prep_(of|by|to|on|for|in|through|with|between)|nn|amod"

    def get_path_as_list(edges, n, src, dst):
        graph = [[None] * n for _ in range(n)]
        for (reln, gov, dep) in edges:
            graph[gov][dep] = reln
            graph[dep][gov] = "-" + reln
        parent = [-1] * n
        visited = [False] * n
        marked = [False] * n
        q = deque([src])
        marked[src] = True
        while q:
            v = q.popleft()
            if visited[v]:
                continue
            visited[v] = True
            if v == dst:
                break
            for k in range(n):
                if not visited[k] and not marked[k] and graph[v][k]:
                    parent[k] = v
                    q.append(k)
                    marked[k] = True
        if parent[dst] == -1:
            return None
        labels = []
        v = dst
        while v != src:
            p = parent[v]
            labels.append(graph[p][v])
            v = p
        labels.reverse()
        return labels

    def get_reachables(toks, dom, edges, targets, index, visited,
                       domain_specific):
        if visited[index]:
            return
        visited[index] = True
        if domain_specific and "PROTEIN" in toks[index]:
            targets.add(index)
        if not domain_specific and dom[index] is not None:
            domain_specific = True
        for (reln, gov, dep) in edges:
            if gov == index and re.fullmatch(REACH, reln):
                get_reachables(toks, dom, edges, targets, dep, visited,
                               domain_specific)

    def reference_rule3(toks, pos, dom, edges):
        n = len(toks)
        out = set()
        domain_term_pos = -1
        for i in range(n):
            if (i - domain_term_pos) < 5 and "PROTEIN" in toks[i]:
                for j in range(i + 1, n):
                    if "PROTEIN" in toks[j]:
                        pl = get_path_as_list(edges, n, i, j)
                        if pl:
                            for k in range(1, len(pl)):
                                if re.fullmatch("-?prep_between", pl[k]) and \
                                   re.fullmatch("-?prep_between", pl[k - 1]):
                                    out.add((i, j))
                                    break
            if dom[i] is not None:
                domain_term_pos = i
        for i in range(n):
            if pos[i].startswith("N") and dom[i] is not None:
                reach = set()
                get_reachables(toks, dom, edges, reach, i, [False] * n, True)
                for a in reach:
                    for b in reach:
                        if a < b and i < a:
                            out.add((a, b))
        for (reln, gov, dep) in edges:
            if reln == "partmod" and dom[dep] is not None:
                tset, aset = set(), set()
                get_reachables(toks, dom, edges, tset, dep, [False] * n, True)
                get_reachables(toks, dom, edges, aset, gov, [False] * n, True)
                for a in aset:
                    for t in tset:
                        if a < t:
                            out.add((a, t))
        return out

    rng = random.Random(41)
    relns = ["prep_between", "prep_of", "nn", "amod", "agent", "partmod",
             "dobj", "nsubj", "prep_with"]
    vocab = ["PROTEIN0", "PROTEIN1", "PROTEIN2", "binds", "x", "data"]
    pos_of = {"PROTEIN0": "NN", "PROTEIN1": "NN", "PROTEIN2": "NN",
              "binds": "VBZ", "x": "DT", "data": "NN"}
    for _ in range(600):
        n = rng.randint(2, 8)
        toks = [rng.choice(vocab) for _ in range(n)]
        pos = [pos_of[w] for w in toks]
        dom = ["bind" if rng.random() < 0.3 else None for _ in range(n)]
        used = set()
        edges = []
        for _ in range(rng.randint(0, 8)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b and (a, b) not in used:
                used.add((a, b))
                edges.append((rng.choice(relns), a, b))
        s = Sent(toks, pos, dom)
        got = rule3(s, DepGraph(edges))
        exp = reference_rule3(toks, pos, dom, edges)
        assert got == exp, (toks, pos, dom, edges, got, exp)


def test_rule2_matches_verbatim_reference():
    """Seeded fuzz: rule2 equals a verbatim transliteration of
    RelexRule2 (java:21-122): prep-chain DFS from seed dependents,
    NN-NN edge endpoints expanded via NP entities, and the
    isDomainSpecific quirk that indexes the sentence by PATH position
    in its else-branch (java:115)."""
    import random
    import re

    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import Sent, rule2

    PREP = re.compile(r"prep_(of|by|to|on|for|in|through|with)")
    NP = re.compile(r"nn|amod|advmod")

    def gov_deps(edges, gov, pat):
        return [e for e in edges if e[1] == gov and pat.fullmatch(e[0])]

    def add_path(gov, edges, cur, paths, pat, visited):
        if visited[gov]:
            return
        visited[gov] = True
        deps = gov_deps(edges, gov, pat)
        if not deps:
            paths.append(list(cur))
        else:
            for sd in deps:
                cur.append(sd)
                add_path(sd[2], edges, cur, paths, pat, visited)
                cur.pop()
        visited[gov] = False

    def head_entity(head, toks, edges, pat):
        reach = [head] + [e[2] for e in gov_deps(edges, head, pat)]
        ent = -1
        for p in reach:
            if "PROTEIN" in toks[p] and p > ent:
                ent = p
        return ent

    def entities_from_np(head, toks, edges, pat):
        agents = []
        agent = head_entity(head, toks, edges, pat)
        if agent != -1:
            agents.append(agent)
            if agent != head:
                for e in edges:
                    if e[2] == agent and re.fullmatch("conj.*", e[0]):
                        nxt = head_entity(e[1], toks, edges, pat)
                        if nxt != -1:
                            agents.append(nxt)
        if not agents:
            for e in gov_deps(edges, head, re.compile("appos")):
                a = head_entity(e[2], toks, edges, pat)
                if a != -1:
                    agents.append(a)
        return agents

    def np_chunk(p, edges):
        lo = hi = p
        for (reln, gov, dep) in edges:
            if re.fullmatch("nn|amod|advmod", reln) and (gov == p or dep == p):
                lo = min(lo, gov, dep)
                hi = max(hi, gov, dep)
        return lo, hi

    def is_domain_specific(toks, pos, dom, edges, path):
        for i, (reln, gov, dep) in enumerate(path):
            if pos[gov].startswith("N"):
                lo, hi = np_chunk(gov, edges)
                for j in range(lo, hi + 1):
                    if dom[j] is not None:
                        return True
            elif i < len(toks) and dom[i] is not None:  # path-index quirk
                return True
        return False

    def reference_rule2(toks, pos, dom, edges):
        n = len(toks)
        paths = []
        for seed in edges:
            if PREP.fullmatch(seed[0]):
                add_path(seed[2], edges, [seed], paths, PREP, [False] * n)
        out = set()
        for path in paths:
            for i, (reln, gov, dep) in enumerate(path):
                if not pos[gov].startswith("NN") or \
                        not pos[dep].startswith("NN"):
                    continue
                agents = set(entities_from_np(gov, toks, edges, NP))
                targets = set(entities_from_np(dep, toks, edges, NP))
                if not agents or not targets:
                    continue
                if not is_domain_specific(toks, pos, dom, edges,
                                          path[:i + 1]):
                    continue
                for a in agents:
                    for t in targets:
                        out.add((a, t) if a < t else (t, a))
        return out

    rng = random.Random(53)
    relns = ["prep_of", "prep_with", "prep_by", "nn", "amod", "advmod",
             "conj_and", "appos", "dobj"]
    vocab = ["PROTEIN0", "PROTEIN1", "PROTEIN2", "binds", "x", "data"]
    pos_of = {"PROTEIN0": "NN", "PROTEIN1": "NN", "PROTEIN2": "NNS",
              "binds": "VBZ", "x": "DT", "data": "NN"}
    for _ in range(600):
        n = rng.randint(2, 8)
        toks = [rng.choice(vocab) for _ in range(n)]
        pos = [pos_of[w] for w in toks]
        dom = ["bind" if rng.random() < 0.3 else None for _ in range(n)]
        edges = []
        for _ in range(rng.randint(0, 8)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.append((rng.choice(relns), a, b))
        s = Sent(toks, pos, dom)
        got = rule2(s, DepGraph(edges))
        exp = reference_rule2(toks, pos, dom, edges)
        assert got == exp, (toks, pos, dom, edges, got, exp)


# --------------------- unshipped experiment rules (RelexRule4/RelexRule6)
def test_rule4_disconnected_and_single_hop():
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import Sent, rule4
    toks = ["PROTEIN0", "xx", "PROTEIN1", "yy", "PROTEIN2"]
    s = Sent(toks, ["NN"] * 5, [None] * 5)
    # 0-2 joined by one nn hop; 4 disconnected from both
    g = DepGraph([("nn", 2, 0), ("det", 2, 1)])
    got = rule4(s, g)
    assert (0, 2) in got            # single nn hop
    assert (0, 4) in got and (2, 4) in got  # disconnected
    # two-hop pairs are excluded
    g2 = DepGraph([("nn", 2, 0), ("nn", 4, 2)])
    assert (0, 4) not in rule4(s, g2)


def test_rule6_shared_subject_and_list_pattern():
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import Sent, rule6
    # shared DOMAIN verb governs both proteins via distributed nsubj
    toks = ["PROTEIN0", "and", "PROTEIN1", "interact", "."]
    pos = ["NN", "CC", "NN", "VBP", "."]
    dom = [None, None, None, "interact", None]
    g = DepGraph([("conj_and", 0, 2), ("nsubj", 3, 0), ("nsubj", 3, 2)])
    assert (0, 2) in rule6(Sent(toks, pos, dom), g)
    # negated shared governor blocks the subject branch, but the list
    # pattern PROT1 CONJ PROT2 W? REL still fires via the regex
    gneg = DepGraph([("conj_and", 0, 2), ("nsubj", 3, 0), ("nsubj", 3, 2),
                     ("neg", 3, 4)])
    assert (0, 2) in rule6(Sent(toks, pos, dom), gneg)
    # far-apart pair without the surface pattern: no fire
    toks2 = ["PROTEIN0", "w", "w", "w", "w", "w", "PROTEIN1", "binds"]
    pos2 = ["NN", "NN", "NN", "NN", "NN", "NN", "NN", "VBZ"]
    dom2 = [None] * 7 + ["binds"]
    g2 = DepGraph([("nsubj", 7, 0), ("nsubj", 7, 6)])
    got = rule6(Sent(toks2, pos2, dom2), g2)
    # j - i = 6 >= 5 blocks the subject branch; but PROT1W+PROT2W?REL...
    # pattern needs (PUNC|CONJ|PROT)+ between — plain W's don't match
    assert (0, 6) not in got


def test_ppi_candidate_rules_match_verbatim_reference():
    """Seeded fuzz: rule_p1/rule_p2/rule_p3 equal verbatim transliterations
    of ppi/Rule1.java:24-103, ppi/Rule2.java:20-57, ppi/Rule3.java:21-55
    (incl. the shared-visited target/agent walks, the coordination-head
    climb, and getPathAsList's unmarked-queue parent-overwrite BFS,
    SimpleDepGraph.java:420-481)."""
    import random
    import re

    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.rules import (Sent, rule_p1, rule_p2,
                                             rule_p3)

    def gov_deps(edges, gov, pat=None):
        return [e for e in edges if e[1] == gov
                and (pat is None or re.fullmatch(pat, e[0]))]

    def dep_deps(edges, dep, pat=None):
        return [e for e in edges if e[2] == dep
                and (pat is None or re.fullmatch(pat, e[0]))]

    def j_reachable(edges, src, directed, max_dist):
        # SimpleDepGraph.getReachableIndices (java:319-366)
        size = max([max(e[1], e[2]) for e in edges], default=0) + 1
        if src >= size:
            return [src]
        graph = [[None] * size for _ in range(size)]
        for (reln, gov, dep) in edges:
            graph[gov][dep] = reln
            if not directed:
                graph[dep][gov] = "-" + reln
        from collections import deque
        dist = [0] * size
        visited = [False] * size
        q = deque([src])
        reach = []
        while q:
            v = q.popleft()
            visited[v] = True
            reach.append(v)
            if dist[v] == max_dist:
                continue
            for i in range(size):
                if not visited[i] and (graph[v][i] is not None
                                       or (not directed and graph[i][v] is not None)):
                    dist[i] = dist[v] + 1
                    q.append(i)
        return reach

    def j_path_as_list(edges, src, dst):
        # getPathAsList undirected (java:420-481): NO marked array, so a
        # frontier node's parent is overwritten by the LAST same-level
        # toucher before its dequeue
        size = max([max(e[1], e[2]) for e in edges], default=0) + 1
        if src >= size or dst >= size:
            return None
        graph = [[None] * size for _ in range(size)]
        for (reln, gov, dep) in edges:
            graph[gov][dep] = reln
            graph[dep][gov] = "-" + reln
        from collections import deque
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

    def negated(edges, i):
        return any(e[0].endswith("neg") for e in gov_deps(edges, i))

    def inside_domain(dom, edges, i, include_self):
        if include_self and dom[i] is not None:
            return True
        if any(dom[e[2]] is not None for e in gov_deps(edges, i)):
            return True
        return any(dom[e[1]] is not None for e in dep_deps(edges, i))

    def j_targets(toks, edges, out, idx, visited, filter_reln):
        if visited[idx]:
            return
        visited[idx] = True
        if "PROTEIN" in toks[idx]:
            out.add(idx)
        for (reln, _g, dep) in gov_deps(edges, idx):
            if not re.fullmatch(filter_reln, reln):
                j_targets(toks, edges, out, dep, visited, filter_reln)

    def j_agents(toks, edges, out, idx, visited, pat):
        if visited[idx]:
            return
        visited[idx] = True
        if "PROTEIN" in toks[idx]:
            out.add(idx)
        for (reln, _g, dep) in gov_deps(edges, idx):
            if re.fullmatch(pat, reln):
                j_agents(toks, edges, out, dep, visited, pat)
        for (_r, gov, _d) in dep_deps(edges, idx, r"abbrev|appos|conj.*"):
            j_agents(toks, edges, out, gov, visited, pat)

    def j_rule1(toks, dom, edges):
        out = set()
        for (reln, gov, dep) in edges:
            if not re.fullmatch(r".*subj|.*subjpass|rcmod", reln):
                continue
            if negated(edges, gov) or negated(edges, dep):
                continue
            agents, targets = set(), set()
            visited = [False] * len(toks)
            if not re.fullmatch(r"nsubj|nsubjpass", reln):
                j_targets(toks, edges, targets, dep, visited, "NONE")
                j_agents(toks, edges, agents, gov, visited,
                         r"nn|amod|appos|conj.*|prep.*|dobj|dep|abbrev")
            else:
                ri = j_reachable(edges, dep, True, 100)
                for r in ri:
                    visited[r] = True
                j_targets(toks, edges, targets, gov, visited, "NONE")
                for r in ri:
                    visited[r] = False
                visited[dep] = False
                j_agents(toks, edges, agents, dep, visited,
                         r"nn|amod|appos|conj.*|prep.*|dobj|dep|abbrev|partmod")
            for a in agents:
                for t in targets:
                    out.add((min(a, t), max(a, t)))
        return out

    def j_rule2(toks, dom, edges):
        out = set()
        for i in range(len(toks)):
            if inside_domain(dom, edges, i, True) or "PROTEIN" in toks[i]:
                reach = set()

                def rec(idx, visited):
                    if visited[idx]:
                        return
                    visited[idx] = True
                    if "PROTEIN" in toks[idx]:
                        reach.add(idx)
                    for (reln, _g, dep) in gov_deps(edges, idx):
                        if re.fullmatch(r"agent|prep.*|appos|abbrev|nn|amod|dep", reln):
                            rec(dep, visited)

                rec(i, [False] * len(toks))
                for a in reach:
                    for b in reach:
                        if a < b:
                            out.add((a, b))
        return out

    def j_rule3(toks, edges):
        out = set()
        for i in range(len(toks)):
            if "PROTEIN" not in toks[i]:
                continue
            for j in range(i + 1, len(toks)):
                if "PROTEIN" not in toks[j]:
                    continue
                pl = j_path_as_list(edges, i, j)
                if not pl:
                    continue
                for k in range(1, len(pl)):
                    if re.fullmatch(r"-?prep_between", pl[k]) and \
                            re.fullmatch(r"-?prep_between", pl[k - 1]):
                        out.add((i, j))
                        break
        return out

    relns = ["nsubj", "nsubjpass", "rcmod", "dobj", "nn", "amod", "appos",
             "conj_and", "prep_of", "prep_between", "dep", "abbrev",
             "partmod", "neg", "advmod", "agent", "xcomp"]
    rng = random.Random(67)
    for trial in range(400):
        n = rng.randint(3, 12)
        toks = [("PROTEIN%d" % i) if rng.random() < 0.4 else "w%d" % i
                for i in range(n)]
        dom = [("t%d" % i) if rng.random() < 0.25 else None
               for i in range(n)]
        pos = ["NN"] * n
        m = rng.randint(1, 2 * n)
        edges = []
        seen = set()
        for _ in range(m):
            gv, dp = rng.randrange(n), rng.randrange(n)
            if gv == dp:
                continue
            reln = rng.choice(relns)
            if (reln, gv, dp) in seen:
                continue
            seen.add((reln, gv, dp))
            edges.append((reln, gv, dp))
        s = Sent(toks, pos, dom)
        g = DepGraph(edges)
        assert rule_p1(s, g) == j_rule1(toks, dom, edges), (trial, toks, edges)
        assert rule_p2(s, g) == j_rule2(toks, dom, edges), (trial, toks, edges)
        assert rule_p3(s, g) == j_rule3(toks, edges), (trial, toks, edges)
