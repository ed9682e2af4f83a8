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
