"""Instance filters over kernel-scoring relation instances.

Pure predicates ported from ``ppi/filter/*.java`` — each takes the
instance dict produced by ``kernels.kernelscore.relation_instance`` plus
the sentence's DepGraph, and returns True to KEEP the instance.  In the
distributed engine they compose as plain ``filter`` predicates inside
the kernel-scoring vUDF (or as DataFrame ``.filter`` on the materialized
``ktype`` column for the type filter) — no shuffle, no extra pass.
"""

from __future__ import annotations

import re

from nlp_lib_spark.kernels.depgraph import DepGraph

_DOM_EXCL_RE = re.compile(r".*cl|ccomp|csubj|rcmod|parataxis|dep")
_RIGHT_SKIP = r"rcmod|conj_(and|or|but)|advcl"


def path_filter(inst: dict) -> bool:
    """PathFilter (ppi/filter/PathFilter.java): drop null-path instances."""
    return inst["path"] is not None


def negative_filter(inst: dict, g: DepGraph) -> bool:
    """NegativeFilter (ppi/filter/NegativeFilter.java:42-58): drop when
    any backbone word node governs a ``neg`` edge."""
    path = inst["path"]
    if path is None:
        return False  # java:29-31 skips null-path instances entirely
    for i in range(0, len(path), 2):
        idx = int(path[i])
        if any(e[0] == "neg" for e in g.gov_edges(idx)):
            return False
    return True


def juxtapos_filter(inst: dict) -> bool:
    """JuxtaposFilter (ppi/filter/JuxtaposFilter.java:37-50): same-token
    pairs survive only when the LCS is a noun right of the entity."""
    if inst["e1"] != inst["e2"]:
        return True
    lcs = inst["lcs"]
    tokens, pos, _ = inst["ctx"]
    if lcs < 0 or lcs >= len(pos):
        return False
    return pos[lcs].startswith("N") and lcs > inst["e2"]


def domain_filter(inst: dict, g: DepGraph) -> bool:
    """DomainFilter (ppi/filter/DomainFilter.java:36-72): keep when a
    DOMAIN term sits on the backbone, on a dependent of a backbone node,
    or (for a right-side LCS) on a non-clausal governor of the LCS."""
    path = inst["path"]
    if path is None:
        return False
    _, _, domain = inst["ctx"]
    lcs, e2 = inst["lcs"], inst["e2"]
    for i in range(0, len(path), 2):
        idx = int(path[i])
        if domain[idx] is not None:
            return True
        if idx == lcs and lcs >= e2:
            for (reln, gov, dep) in g.dep_edges(idx):
                if (not _DOM_EXCL_RE.fullmatch(reln)
                        and domain[gov] is not None):
                    return True
        for (reln, gov, dep) in g.gov_edges(idx):
            if domain[dep] is not None:
                return True
    return False


def left_pattern_filter(inst: dict) -> bool:
    """LeftPatternFilter (ppi/filter/LeftPatternFilter.java:33-72): a
    LEFT-type instance needs at least one prep/agent edge on either side
    of the LCS along the backbone."""
    path = inst["path"]
    if path is None:
        return False
    if inst["lcs"] >= inst["e1"]:
        return True
    lcs_index = inst["lcs_index"]
    preps = False
    for i in range(lcs_index - 1, 0, -2):
        if path[i].startswith("-prep") or path[i] == "-agent":
            preps = True
            break
    if not preps:
        for i in range(lcs_index + 1, len(path), 2):
            if path[i].startswith("prep") or path[i] == "agent":
                preps = True
                break
    return preps


def middle_pattern_filter(inst: dict) -> bool:
    """MiddlePatternFilter (ppi/filter/MiddlePatternFilter.java:38-56):
    a MIDDLE-type backbone must not cross a clausal edge
    (advcl|ccomp|parataxis; rcmod is allowed)."""
    if not (inst["e1"] < inst["lcs"] < inst["e2"]):
        return True
    path = inst["path"]
    for i in range(1, len(path), 2):
        if path[i].lstrip("-") in ("advcl", "ccomp", "parataxis"):
            return False
    return True


def right_pattern_filter(inst: dict, g: DepGraph) -> bool:
    """RightPatternFilter (ppi/filter/RightPatternFilter.java:36-61): a
    RIGHT-type verbal LCS must not reach another PROTEIN to its right
    (depth 10, clausal/conjunct edges removed before the walk)."""
    lcs, e1, e2 = inst["lcs"], inst["e1"], inst["e2"]
    if lcs <= e2:
        return True
    tokens, pos, _ = inst["ctx"]
    reach = g.reachable(lcs, True, 10, skip_pattern=_RIGHT_SKIP)
    protein = any(i > lcs and i != e1 and i != e2 and "PROTEIN" in tokens[i]
                  for i in reach)
    return (not protein) or pos[lcs].startswith("N")


def relation_type_filter(inst: dict, typ: str) -> bool:
    """RelationTypeFilter (ppi/filter/RelationTypeFilter.java): keep one
    LEFT/MIDDLE/RIGHT stratum (used to train per-type models)."""
    return inst["type"] == typ


def apply_standard_filters(inst: dict, g: DepGraph) -> bool:
    """The composed runtime filter chain: path -> negation -> juxtapos ->
    domain -> left/middle/right pattern (Experiment.java wires these in
    sequence before kernel scoring)."""
    return (path_filter(inst)
            and negative_filter(inst, g)
            and juxtapos_filter(inst)
            and domain_filter(inst, g)
            and left_pattern_filter(inst)
            and middle_pattern_filter(inst)
            and right_pattern_filter(inst, g))
