"""PPI candidate-pair feature extraction (shallow ``"KEY=value"`` features).

Re-expresses the shipped feature pipe ``ppi/PPIPipe2.java:48-79`` feature
families as a pure function of (tokens, pos, domain, edges, e1, e2):

* surface windows ±4 around the entities restricted to DOMAIN words +
  ``TOKEN_DIST`` + fused same-token features (java:107-152);
* dependency-path features: per-edge DOMAIN projections with L/M/R position
  buckets, ``NEG-<reln>`` flags, the collapsed path ``subj:/mod:/prep_x:/o:``
  and ``DEP_PATH_LEN`` (java:197-253), ``NULL_PATH`` distance fallback;
* LCS-head stand-in: the DOMAIN term nearest the pair (key-term feature,
  java:450-525 uses bounded-BFS key terms — the predicate term plays that
  role here).

Feature hashing happens downstream (scoring uses a broadcast weight map;
training uses a dictionary vectorizer) — features stay human-readable
``array<string>`` per SURVEY.md §1.
"""

from __future__ import annotations

from nlp_lib_spark.kernels.depgraph import DepGraph


def pair_features(tokens: list[str], pos: list[str],
                  domain: list[str | None], g: DepGraph,
                  e1: int, e2: int) -> list[str]:
    f: list[str] = []
    n = len(tokens)

    # ---- surface windows (PPIPipe2.java:107-152) ----
    for i in range(max(0, e1 - 4), e1):
        if domain[i] is not None:
            f.append(f"E1-L-WIN-{tokens[i]}")
    for i in range(e2 + 1, min(n, e2 + 4)):
        if domain[i] is not None:
            f.append(f"E2-R-WIN-{tokens[i]}")
    for i in range(e1 + 1, e2):
        if domain[i] is not None:
            f.append(f"E12-M-WIN-{tokens[i]}")
    f.append(f"TOKEN_DIST={min(e2 - e1, 10)}")

    if e1 == e2:  # fused same-token pair
        parent = g.parent(e1)
        if e2 < n - 1 and domain[e2 + 1] is not None:
            f.append(f"SAME-DOM={domain[e2 + 1]}")
        elif parent != -1 and domain[parent] is not None:
            f.append(f"SAME-DOM={domain[parent]}")
        else:
            for (_r, _g, dep) in g.gov_edges(e1):
                if domain[dep] is not None:
                    f.append(f"SAME-DOM={domain[dep]}")
                    break

    # ---- dependency path (PPIPipe2.java:197-253) ----
    path = g.path_edges(e1, e2) if e1 != e2 else []
    if path is None:
        f.append(f"NULL_PATH={min(e2 - e1, 10)}")
        return sorted(set(f))
    cpath: list[str] = []
    for (reln, gov, dep) in path:
        dg = domain[gov]
        if dg is not None:
            f.append(f"{reln}={dg}")
            f.append(f"DOM={dg}")
            if gov < e1:
                f.append(f"L-{dg}={reln}")
            elif gov < e2:
                f.append(f"M-{dg}={reln}")
            else:
                f.append(f"R-{dg}={reln}")
        if g.gov_edges(gov, r"neg"):
            f.append(f"NEG-{reln}")
        if reln in ("nsubj", "nsubjpass"):
            cpath.append("subj:")
        elif reln in ("rcmod", "partmod"):
            cpath.append("mod:")
        elif reln.startswith("prep"):
            cpath.append(reln + ":")
        else:
            cpath.append("o:")
    f.append(f"DEP_PATH_LEN={min(len(path), 10)}")
    f.append("CPATH=" + "".join(cpath))

    # FORM-TYPE (PPIPipe v1, ppi/PPIPipe.java:44-73 via RuleExtractor.check)
    from nlp_lib_spark.kernels.rules import form_type
    ft = form_type(tokens, pos, domain, g.edges, e1, e2)
    if ft != -1:
        f.append(f"FORM-TYPE={ft}")
    return sorted(set(f))


def pair_features_v1(tokens: list[str], pos: list[str],
                     domain: list[str | None], g: DepGraph,
                     e1: int, e2: int) -> list[str]:
    """PPIPipe v1 feature families (``ppi/PPIPipe.java:44-73``) that are not
    part of the shipped PPIPipe2 set — the FORM-TYPE companion families:

    * Rule1 subj/path features (``addSubjFeatures``/``addPathFeatures``,
      PPIPipe.java:227-308): first ``nsubj``-containing path edge yields
      ``SBJ=<domain|NONE>``; ``rcmod`` edges yield ``RCMOD=...``;
      ``DOMAIN=<bool>`` records any DOMAIN token on the path; the v1
      collapsed path dedupes consecutive classes (``*``/``subj``/``prep``/
      ``o``) unlike PPIPipe2's per-edge collapse.
    * Rule2 PP-reachability (``addRule2Features``/``getPPReachables``,
      PPIPipe.java:310-381,453-479): DOMAIN-tagged governors reachable
      upward over ``nn|amod|appos|prep.*|pobj|agent|abbrev`` from both
      entities; common reachables emit ``PP``/``PP_PAT*``; ``PP_PATH``
      flags a path that is >70% prep/nn/amod hops (note the reference's
      ``-?(prep|pobj|nn|amod)`` FULL-match treats collapsed ``prep_x``
      as non-PP — replicated).
    * Rule3 prep-chain flags (``addRule3Features``, PPIPipe.java:383-403):
      ``PREP_BETWEEN``/``PREP_PREP`` consecutive-prep detection +
      ``PREP_PATH`` concat.
    * LCS summary (``addLCSFeatures``, PPIPipe.java:404-422; defined in
      the reference but not wired into the v1 dispatch — included here
      for the parity table): ``LCS=<form>-<domain|E1|E2|O|NONE>``.

    This engine carries ONE frozen CC-processed graph (the reference's
    eval paths read pre-parsed ``deps``+``depsCC`` files; SURVEY §7.3), so
    both the depGraph and ccDepGraph roles are served by ``g``.  The
    reference iterates common reachables in HashSet order; this port uses
    ascending index order (deterministic).  Path node indices follow the
    traversal-target convention of ``getPathAsIndexList``.
    """
    import re as _re

    from nlp_lib_spark.kernels.rules import form_type

    f: dict[str, str] = {}
    form = form_type(tokens, pos, domain, g.edges, e1, e2)
    f["FORM-TYPE"] = str(form)

    labels = g.path_labels(e1, e2)
    edges = g.path_edges(e1, e2)
    if labels is not None and edges:
        # traversal-target index per path position
        idxs = []
        cur = e1
        for (reln, gov, dep) in edges:
            cur = dep if gov == cur else gov
            idxs.append(cur)
        # ---- Rule1: subj / rcmod / domain flag (java:227-267) ----
        dom_flag = False
        for lab, idx in zip(labels, idxs):
            if "nsubj" in lab:
                f["SBJ"] = domain[idx] if domain[idx] is not None else "NONE"
                if domain[idx] is not None:
                    dom_flag = True
                break
            if _re.fullmatch("rcmod", lab):
                f["RCMOD"] = (domain[idx] if domain[idx] is not None
                              else "NONE")
            if domain[idx] is not None:
                dom_flag = True
        f["DOMAIN"] = str(dom_flag)
        # ---- Rule1: v1 collapsed path (java:269-308) ----
        parts: list[str] = []
        prev = ""
        for lab, idx in zip(labels, idxs):
            if _re.fullmatch(r"-?(amod|nn|prep|conj|dep|appos|abbrev)", lab):
                cur_c = "*"
            elif _re.fullmatch(r"-?(nsubj|nsubjpass|partmod|rcmod)", lab):
                cur_c = "subj"
            elif (_re.fullmatch(r"-?(pobj)", lab) and _re.fullmatch(
                    "by|through|in|of|to|between", tokens[idx])):
                cur_c = "prep"
            elif _re.fullmatch(r"-?prep_.*", lab):
                cur_c = "prep"
            else:
                cur_c = "o"
            if cur_c != prev:
                parts.append(cur_c + ":")
                prev = cur_c
        f["CPATH"] = "".join(parts) if parts else "NONE"
        # ---- Rule2: PP_PATH fraction (java:365-381) ----
        n_non = sum(1 for lab in labels
                    if not _re.fullmatch(r"-?(prep|pobj|nn|amod)", lab))
        f["PP_PATH"] = str((n_non / len(labels)) <= 0.3)
        # ---- Rule3: consecutive preps + prep path (java:383-403) ----
        for k in range(1, len(labels)):
            if _re.fullmatch(r"-?prep_between", labels[k]) and \
               _re.fullmatch(r"-?prep_between", labels[k - 1]):
                # the reference's map keys carry a quirky trailing '='
                # ("PREP_BETWEEN=", PPIPipe.java:390); normalized here so
                # the rendered feature is single-'=' like every family
                f["PREP_BETWEEN"] = "TRUE"
                break
            if _re.fullmatch(r"-?prep.*", labels[k]) and \
               _re.fullmatch(r"-?prep.*", labels[k - 1]):
                f["PREP_PREP"] = "TRUE"
                break
        f["PREP_PATH"] = "".join(lab + ":" for lab in labels
                                 if _re.fullmatch(r"-?prep_.*", lab))

    # ---- Rule2: PP reachability (java:310-364,453-479) ----
    def pp_reach(ent: int) -> set[int]:
        seen: set[int] = set()
        out: set[int] = set()
        q = [ent]
        while q:
            top = q.pop(0)
            if top in seen:
                continue
            seen.add(top)
            for (reln, gov, dep) in g.dep_edges(top):
                if _re.fullmatch(r"nn|amod|appos|prep.*|pobj|agent|abbrev",
                                 reln):
                    q.append(gov)
                    if domain[gov] is not None:
                        out.add(gov)
        return out

    commons = sorted(pp_reach(e1) & pp_reach(e2))
    if commons:
        for common in commons:
            p1 = g.path_labels(common, e1)
            if p1 is None:
                continue
            p2 = g.path_labels(common, e2)
            if p2 is None:
                continue
            # last pobj word on each chain (never present with collapsed
            # preps -> 'None', faithfully mirroring the java null print)
            pp1 = pp2 = "None"
            if domain[common] is not None:
                f["PP"] = "DOMAIN"
                f["PP_PAT"] = f"{pos[common]}&{pp1}&{pp2}"
            elif "PP" not in f:
                f["PP"] = "NON-DOMAIN"
                f["PP_PAT1"] = f"{pos[common]}&{pp1}"
                f["PP_PAT2"] = f"{pos[common]}&{pp2}"
    else:
        f["PP"] = "NONE"

    # ---- LCS summary (java:404-422) ----
    lcs = g.lcs(e1, e2)
    if lcs == -1:
        f["LCS"] = f"{form}-NONE"
    elif domain[lcs] is not None:
        f["LCS"] = f"{form}-{domain[lcs]}"
    elif lcs == e1:
        f["LCS"] = f"{form}-E1"
    elif lcs == e2:
        f["LCS"] = f"{form}-E2"
    else:
        f["LCS"] = f"{form}-O"

    return sorted(f"{k}={v}" for k, v in f.items())
