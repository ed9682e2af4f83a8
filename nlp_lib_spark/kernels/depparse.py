"""Frozen deterministic dependency builder (CC-processed style).

The reference never parses at extraction time in its eval paths — it consumes
*pre-computed* Stanford dependency files (``ppi/MLExtractor.java:61-69``,
``ppi/PreparePPI2.java:118`` for the CCprocessed variant). This module is the
rebuild's frozen, deterministic substitute "parser": a shallow rule
attachment producing exactly the relation vocabulary the RelEx rules consume
(``nsubj/nsubjpass, dobj, prep_<w>, nn, amod, advmod, det, num, conj_<w>,
neg``), with Stanford-style CC distribution of subject/object/prep edges
across conjuncts.

Determinism is the contract: the oracle and the Arrow-UDF pipeline share this
code, so P/R parity only measures distribution correctness.
"""

from __future__ import annotations

from nlp_lib_spark.kernels.postag import BE_FORMS, DO_FORMS, HAVE_FORMS, NEGATIONS

Edge = tuple[str, int, int]

_NP_INNER = {"DT", "JJ", "CD"}


def _is_noun(pos: str) -> bool:
    return pos.startswith("N")


def _is_verb(pos: str) -> bool:
    return pos.startswith("V") or pos == "MD"


def dep_parse(tokens: list[str], pos: list[str]) -> list[Edge]:
    n = len(tokens)
    edges: list[Edge] = []

    # ---- 1. noun runs: maximal DT/JJ/CD/NN* spans; head = last noun ----
    run_head = [-1] * n          # token -> head of its noun run (or -1)
    heads: list[int] = []        # run heads, left to right
    i = 0
    while i < n:
        if pos[i] in _NP_INNER or _is_noun(pos[i]):
            j = i
            while j < n and (pos[j] in _NP_INNER or _is_noun(pos[j])):
                j += 1
            nouns = [k for k in range(i, j) if _is_noun(pos[k])]
            if nouns:
                head = nouns[-1]
                heads.append(head)
                for k in range(i, j):
                    run_head[k] = head
                    if k == head:
                        continue
                    if pos[k] == "JJ":
                        edges.append(("amod", head, k))
                    elif _is_noun(pos[k]):
                        edges.append(("nn", head, k))
                    elif pos[k] == "CD":
                        edges.append(("num", head, k))
                    elif pos[k] == "DT":
                        edges.append(("det", head, k))
            i = j
        else:
            i = 1 + i

    # ---- 2. verb groups: aux (be/do/have/md) attach to the next verb ----
    lexical: list[int] = []
    passive: dict[int, bool] = {}
    verb_idx = [k for k in range(n) if _is_verb(pos[k])]
    aux_words = BE_FORMS | DO_FORMS | HAVE_FORMS
    k = 0
    while k < len(verb_idx):
        v = verb_idx[k]
        w = tokens[v].lower()
        nxt = verb_idx[k + 1] if k + 1 < len(verb_idx) else None
        if (w in aux_words or pos[v] == "MD") and nxt is not None and nxt - v <= 3:
            # aux of the following lexical verb
            is_be = w in BE_FORMS
            k += 1
            v2 = verb_idx[k]
            lexical.append(v2)
            passive[v2] = is_be and pos[v2] in ("VBN", "VBD")
            k += 1
        else:
            lexical.append(v)
            passive[v] = False
            k += 1

    # ---- 3/4/5. subjects, negation, objects per lexical verb ----
    for v in lexical:
        left_heads = [h for h in heads if h < v]
        if left_heads:
            subj = left_heads[-1]
            reln = "nsubjpass" if passive[v] else "nsubj"
            edges.append((reln, v, subj))
        for m in range(max(0, v - 3), v):
            if tokens[m].lower() in NEGATIONS and not any(
                u in lexical and m < u < v for u in range(m + 1, v)
            ):
                edges.append(("neg", v, m))
        # direct object: next run head with only DT/JJ/RB/CD between
        right_heads = [h for h in heads if h > v]
        if right_heads:
            obj = right_heads[0]
            between = range(v + 1, obj)
            if all(pos[b] in ("DT", "JJ", "RB", "CD") or _is_noun(pos[b])
                   for b in between):
                edges.append(("dobj", v, obj))

    # ---- 5b. adverbs attach to the nearest lexical verb (advmod) ----
    neg_deps = {d for (r, g, d) in edges if r == "neg"}
    for a in range(n):
        if pos[a] == "RB" and a not in neg_deps and lexical:
            gov = min(lexical, key=lambda v: (abs(v - a), v))
            edges.append(("advmod", gov, a))

    # ---- 6. prepositions: collapsed prep_<word>(gov, obj) ----
    for p in range(n):
        if pos[p] not in ("IN", "TO"):
            continue
        right_heads = [h for h in heads if h > p]
        obj = -1
        for h in right_heads:
            if all(pos[b] in ("DT", "JJ", "CD") or _is_noun(pos[b])
                   for b in range(p + 1, h)):
                obj = h
            break
        if obj == -1:
            continue
        # governor: preceding noun-run head if adjacent, else nearest verb,
        # else nearest head to the left
        gov = -1
        q = p - 1
        while q >= 0 and pos[q] == "RB":
            q -= 1
        if q >= 0 and run_head[q] != -1 and run_head[q] <= q:
            gov = run_head[q]
        else:
            left_verbs = [v for v in lexical if v < p]
            if left_verbs:
                gov = left_verbs[-1]
            else:
                left_heads = [h for h in heads if h < p]
                if left_heads:
                    gov = left_heads[-1]
        if gov == -1 or gov == obj:
            continue
        edges.append((f"prep_{tokens[p].lower()}", gov, obj))

    # ---- 7. conjunctions + CC distribution ----
    conj_pairs: list[tuple[int, int, str]] = []
    for c in range(n):
        if pos[c] != "CC":
            continue
        cw = tokens[c].lower()
        left = [h for h in heads if h < c]
        right = [h for h in heads if h > c]
        if not left or not right:
            continue
        a, b = left[-1], right[0]
        gap_ok = all(
            run_head[g] in (a, b) or pos[g] in ("CC", ",")
            for g in range(a + 1, b) if g != c
        )
        if gap_ok:
            conj_pairs.append((a, b, cw))
            edges.append((f"conj_{cw}", a, b))
    for a, b, _cw in conj_pairs:
        extra: list[Edge] = []
        for reln, g, d in edges:
            if d == a and (reln in ("nsubj", "nsubjpass", "dobj")
                           or reln.startswith("prep_")):
                extra.append((reln, g, b))
        for e in extra:
            if e not in edges:
                edges.append(e)

    return edges
