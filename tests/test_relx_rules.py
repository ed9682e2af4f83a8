"""Fuzz the relx.Rule1/2/4 experiment ports against verbatim
transliterations of relx/Rule.java + Rule1.java + Rule2.java + Rule4.java.

Comparison is multiset-valued: the reference iterates HashSets whose order
is JVM-dependent, so pair multiplicity (not emission order) is the parity
contract.
"""

from __future__ import annotations

import random
import re
from collections import Counter

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.relx_rules import (XSent, relx_rule1, relx_rule2,
                                              relx_rule4)


def gov_deps(edges, gov, pat=None):
    return [e for e in edges if e[1] == gov
            and (pat is None or re.fullmatch(pat, e[0]))]


def dep_deps(edges, dep, pat=None):
    return [e for e in edges if e[2] == dep
            and (pat is None or re.fullmatch(pat, e[0]))]


def j_add_path(gov, edges, cur, paths, path_pat, visited):
    if visited[gov]:
        return
    visited[gov] = True
    deps = gov_deps(edges, gov, path_pat)
    if not deps:
        paths.append(list(cur))
    else:
        for sd in deps:
            cur.append(sd)
            j_add_path(sd[2], edges, cur, paths, path_pat, visited)
            cur.pop()
    visited[gov] = False


def j_paths_frm_src(n, edges, start, start_pat, path_pat):
    paths = []
    for seed in gov_deps(edges, start, start_pat):
        j_add_path(seed[2], edges, [seed], paths, path_pat, [False] * n)
    return paths


def j_all_paths(n, edges, start_pat, path_pat, from_gov):
    paths = []
    for seed in [e for e in edges if re.fullmatch(start_pat, e[0])]:
        start = seed[1] if from_gov else seed[2]
        j_add_path(start, edges, [seed], paths, path_pat, [False] * n)
    return paths


def j_head_entity(head, toks, lexe, edges, pat):
    reach = [head] + [e[2] for e in gov_deps(edges, head, pat)]
    ent = -1
    for p in reach:
        if lexe[p] == "B" and p > ent:
            ent = p
    return ent


def j_entities_np(head, toks, lexe, edges, pat):
    agents = []
    agent = j_head_entity(head, toks, lexe, edges, pat)
    if agent != -1:
        agents.append(agent)
        if agent != head:
            for (_r, gov, _d) in dep_deps(edges, agent, r"conj.*"):
                nxt = j_head_entity(gov, toks, lexe, edges, pat)
                if nxt != -1:
                    agents.append(nxt)
    if not agents:
        for (_r, _g, dep) in gov_deps(edges, head, r"appos"):
            a = j_head_entity(dep, toks, lexe, edges, pat)
            if a != -1:
                agents.append(a)
    return agents


def j_np_chunk(pos, edges):
    es = gov_deps(edges, pos, r"nn|amod|advmod") + \
        dep_deps(edges, pos, r"nn|amod|advmod")
    lo = hi = pos
    for (_r, gv, dp) in es:
        lo = min(lo, gv, dp)
        hi = max(hi, gv, dp)
    return lo, hi


P1 = re.compile(
    r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\s(via|after|with|if|once|requires"
    r"|require|when|through|due to|in case|provided that|effect of|result of"
    r"|member of|in response to"
    r"|under.*<<NN.*control|under( the)? control of"
    r"|depend(s|ed|ent)? ([a-z]+)? on).*")
P2 = re.compile(r".*(requires|belongs? to|require|depend(s|ed|ent)? (on|upon)).*")
P3 = re.compile(r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\sby.*")
P4 = re.compile(
    r".*(t|d|ion|ing)<<(VB|AUX|MD|NN|JJ).*\sby.*(time|times|fold|(ing<<VB)).*")
NOMARK = (r"belong(s|ed)?|requires?|effect|provided|effect|result|member"
          r"|response|control|depend(s|ed|ent)?")
RCHEAD = r"similar|include(s|d)?|members?|identical|involve(s|d)?"


def j_chunk_marked(chunk, toks, pos):
    sb = ""
    for j in range(chunk[0], chunk[1] + 1):
        if re.fullmatch(r"(VB|NN|JJ).*", pos[j]) and \
                not re.fullmatch(NOMARK, toks[j]):
            sb += toks[j] + "<<" + pos[j] + " "
        else:
            sb += toks[j] + " "
    return sb


def j_rule1(toks, pos, lexe, edges, restriction):
    n = len(toks)
    out = []

    def agents_of(subj, path):
        agents = set(j_entities_np(subj, toks, lexe, edges, r"nn|amod"))
        for p in j_paths_frm_src(n, edges, subj, r"prep.*|partmod",
                                 r"prep.*|agent|dobj"):
            prep_head = -1
            for (reln, _g, dep) in p:
                if re.fullmatch(r"prep_(of|from|like|including|in)", reln):
                    prep_head = max(prep_head, dep)
            if prep_head != -1:
                agents.update(j_entities_np(prep_head, toks, lexe, edges,
                                            r"nn|amod"))
        main_head = path[0][1] if path else -1
        for (_r, _g2, dep) in gov_deps(edges, subj, r"rcmod"):
            if dep != main_head and re.fullmatch(RCHEAD, toks[dep].lower()):
                for p in j_paths_frm_src(n, edges, dep, r".*obj|prep.*",
                                         r".*obj|prep.*"):
                    for (_r2, _g3, head) in p:
                        tmp = j_entities_np(head, toks, lexe, edges,
                                            r"nn|amod")
                        if tmp:
                            agents.update(tmp)
                            break
        return agents

    def targets_of(path):
        targets = set()
        for i in range(1, len(path)):
            reln, _gv, head = path[i]
            if re.fullmatch(r"rcmod", reln) and \
                    not re.fullmatch(RCHEAD, toks[head].lower()):
                break
            if not pos[head].startswith("NN"):
                continue
            for e in j_entities_np(head, toks, lexe, edges,
                                   r"nn|amod|advmod"):
                targets.add((e, i))
        return targets

    def path_str(path, end):
        sb = ""
        for i in range(end + 1):
            reln, gov, dep = path[i]
            if i == 0:
                sb += j_chunk_marked(j_np_chunk(dep, edges), toks, pos) + " "
                continue
            if pos[gov].startswith("NN"):
                sb += j_chunk_marked(j_np_chunk(gov, edges), toks, pos)
            elif re.fullmatch(r"(VB|JJ).*", pos[gov]) and \
                    not re.fullmatch(NOMARK, toks[gov]):
                sb += toks[gov] + "<<" + pos[gov] + " "
            else:
                sb += toks[gov] + " "
            if re.fullmatch(r"prep_.*", reln):
                sb += reln[reln.index("_") + 1:] + " "
            elif reln == "agent":
                sb += "by "
            if i == end:
                if pos[dep].startswith("NN"):
                    sb += j_chunk_marked(j_np_chunk(dep, edges), toks, pos)
                else:
                    sb += toks[dep] + " "
                break
        return sb

    def domain_chunk(chunk):
        return any(toks[i].lower() in restriction
                   for i in range(chunk[0], chunk[1] + 1))

    def domain(path, end):
        for i in range(end + 1):
            _r, gov, dep = path[i]
            if i == 0:
                if domain_chunk(j_np_chunk(dep, edges)):
                    return True
            else:
                if domain_chunk(j_np_chunk(gov, edges)):
                    return True
                if i == end:
                    if domain_chunk(j_np_chunk(dep, edges)):
                        return True
                    break
        return False

    def negated(path, end):
        for i in range(end + 1):
            _r, gov, dep = path[i]
            if gov_deps(edges, gov, r"neg") or gov_deps(edges, dep, r"neg"):
                return True
        return False

    for path in j_all_paths(n, edges, r"nsubj|nsubjpass",
                            r"dep|agent|.*comp|.*obj|advcl|(inf|part|rc)mod"
                            r"|prep.*", True):
        agents = agents_of(path[0][2], path)
        if not agents:
            continue
        for (target, end) in targets_of(path):
            if domain(path, end) and not negated(path, end):
                ps = path_str(path, end)
                ok = not (P1.fullmatch(ps) or P2.fullmatch(ps)
                          or (P3.fullmatch(ps) and not P4.fullmatch(ps)))
                for a in agents:
                    out.append((a, target) if ok else (target, a))
    return out


def j_rule2(toks, pos, lexe, edges, restriction):
    n = len(toks)
    out = []
    seedp = r"prep.(of|by|to|on|for|in|through|with)"

    def chunk_plain(chunk):
        return "".join(toks[j] + " " for j in range(chunk[0], chunk[1] + 1))

    def domain(sub):
        for (_r, gov, _d) in sub:
            if pos[gov].startswith("NN"):
                for t in re.split(r"[-\s]+",
                                  chunk_plain(j_np_chunk(gov, edges))):
                    if t.lower() in restriction:
                        return True
            elif toks[gov].lower() in restriction:
                return True
        return False

    for path in j_all_paths(n, edges, seedp, seedp, False):
        for i, (reln, gov, dep) in enumerate(path):
            if not (pos[gov].startswith("NN") and pos[dep].startswith("NN")):
                continue
            agents = set(j_entities_np(gov, toks, lexe, edges,
                                       r"nn|amod|advmod"))
            targets = set(j_entities_np(dep, toks, lexe, edges,
                                        r"nn|amod|advmod"))
            if not agents or not targets:
                continue
            if not domain(path[:i + 1]):
                continue
            for a in agents:
                for t in targets:
                    out.append((t, a) if reln.endswith("by") else (a, t))
    return out


def j_rule4(toks, lexe, edges):
    out = []
    for (_r, gov, dep) in [e for e in edges if re.fullmatch(r"amod", e[0])]:
        if lexe[dep] == "B" and toks[dep].endswith("-dependent"):
            for e in j_entities_np(gov, toks, lexe, edges, r"nn|amod"):
                out.append((dep, e))
    return out


def test_relx_rules_match_verbatim_transliteration():
    relns = ["nsubj", "nsubjpass", "rcmod", "dobj", "nn", "amod", "advmod",
             "appos", "conj_and", "prep_of", "prep_by", "prep_in",
             "prep_between", "dep", "agent", "xcomp", "partmod", "neg"]
    words = ["sigA", "kinC-dependent", "transcription", "activation",
             "requires", "interaction", "similar", "includes", "control",
             "expression", "binding", "by", "via", "gene", "member",
             "depends", "belongs"]
    poss = ["NN", "NNS", "VB", "VBZ", "VBN", "JJ", "IN", "DT", "RB", "MD"]
    restriction = frozenset(("interaction", "activation", "requires",
                             "binding", "control", "transcription"))
    rng = random.Random(83)
    for trial in range(400):
        n = rng.randint(3, 11)
        toks = [rng.choice(words) for _ in range(n)]
        pos = [rng.choice(poss) for _ in range(n)]
        lexe = [rng.choice("BIO") for _ in range(n)]
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
        s = XSent(toks, pos, lexe)
        g = DepGraph(edges)
        assert Counter(relx_rule1(s, g, restriction)) == \
            Counter(j_rule1(toks, pos, lexe, edges, restriction)), \
            (trial, toks, pos, lexe, edges)
        assert Counter(relx_rule2(s, g, restriction)) == \
            Counter(j_rule2(toks, pos, lexe, edges, restriction)), \
            (trial, toks, pos, lexe, edges)
        assert Counter(relx_rule4(s, g)) == \
            Counter(j_rule4(toks, lexe, edges)), \
            (trial, toks, pos, lexe, edges)
