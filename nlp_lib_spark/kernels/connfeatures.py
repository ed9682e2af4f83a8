"""Connective disambiguation features.

Port of the ACTIVE feature families of
``ml/PDTBConnective2FeatureVector.java`` (pipe() at java:53-93 — raw
connective string, lowercase variant, syntax-tree block, dependency
block; the clause/temporal/path/constituent blocks are commented out in
the reference and not ported):

* flat: the raw conn string itself, ``LC=<lower>``;
* context (java:96-127): PREV/NXT word and POS with CONN& conjunctions;
* syntactic (java:128-169): conn head = leftmost IN-tagged token else
  last (Wellner head, ConnectiveAnalyzer.java:112-120), POSTRIPLE
  family over the head's governor and siblings in the dep graph,
  PSUBJ/SSUBJ subject-presence flags;
* tree block (java:278-365, optional — needs a constituency tree):
  SELF (unary-climbed LCA label), PARENT, LEFT@-1 (modifier-skipping),
  RIGHT@+1 with VP-containment flag, each also conjoined with the conn,
  plus the fixed SELF/PARENT/LEFT/RIGHT pair conjunctions.

The output is a plain feature-string list — scored with broadcast
weights exactly like the PPI MaxEnt path (kernels/scoring.score).
"""

from __future__ import annotations

import re
from collections import deque

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.tree import Node, lca

_SUBJ_RE = re.compile(r".*subj.*")
_MOD_RE = re.compile(r"RB|ADVP|NP|DT|PP|,")


def conn_head(pos: list[str], start: int, end: int) -> int:
    """Wellner connective head: leftmost IN-tagged token of the span,
    else the last (ConnectiveAnalyzer.getHeadWord, java:112-120)."""
    if start == end:
        return end
    for i in range(start, end + 1):
        if pos[i] == "IN":
            return i
    return end


def _node_val(n: Node) -> str:
    return n.label if n.label else (n.word or "")


def _sibling(n: Node, k: int) -> Node | None:
    p = n.parent
    if p is None:
        return None
    i = p.children.index(n)
    j = i + k
    if 0 <= j < len(p.children):
        return p.children[j]
    return None


def _tree_features(tokens, tree: Node, start: int, end: int) -> list[str]:
    feats: list[str] = []
    conn = " ".join(tokens[start:end + 1]).lower()
    node = lca(tree, start, end)
    if node is None:
        base = ["SELF=<NONE>", "PARENT=<NONE>",
                "LEFT@-1-<NONE>", "RIGHT@+1-<NONE>"]
    else:
        # climb unary rewrites (java:288-291)
        parent = node.parent
        while parent is not None and len(parent.children) == 1:
            node = parent
            parent = node.parent
        base = [f"SELF={_node_val(node)}"]
        base.append(f"PARENT={_node_val(parent)}" if parent is not None
                    else "PARENT=<NONE>")
        left = _sibling(node, -1)
        if left is not None:
            if _MOD_RE.fullmatch(_node_val(left)):
                left2 = _sibling(node, -2)
                if left2 is not None:
                    left = left2
            base.append(f"LEFT@-1-{_node_val(left)}")
        else:
            base.append("LEFT@-1-<NONE>")
        right = _sibling(node, 1)
        if right is not None:
            base.append(f"RIGHT@+1-{_node_val(right)}")
            # a bare word leaf is the only Stanford "leaf"; our fused
            # preterminals count as non-leaves (they dominate a word)
            if right.label:
                contains_vp = False
                q = deque(right.children)
                while q:
                    c = q.popleft()
                    if c.label == "VP":
                        contains_vp = True
                        break
                    if c.children:
                        q.extend(c.children)
                if contains_vp or right.label == "VP":
                    base.append("RIGHT@+1-has-VP")
                else:
                    base.append("RIGHT@+1-has-no-VP")
        else:
            base.append("RIGHT@+1-<NONE>")
    for f in base:
        feats.append(f)
        feats.append(conn + "&" + f)
    # manual syn-syn pair conjunctions (java:355-365)
    SELF, PARENT, LEFT, RIGHT = 0, 1, 2, 3
    feats.append(base[LEFT] + "&" + base[RIGHT])
    feats.append(base[SELF] + "&" + base[LEFT])
    feats.append(base[SELF] + "&" + base[RIGHT])
    feats.append(base[PARENT] + "&" + base[LEFT])
    feats.append(base[PARENT] + "&" + base[RIGHT])
    feats.append(base[SELF] + "&" + base[PARENT])
    if len(base) > 4:
        feats.append(base[RIGHT] + "&" + base[4])
    return feats


def connective_features(tokens: list[str], pos: list[str], g: DepGraph,
                        start: int, end: int,
                        tree: Node | None = None) -> list[str]:
    conn = " ".join(tokens[start:end + 1])
    feats: list[str] = [conn, "LC=" + conn.lower()]
    if tree is not None:
        feats.extend(_tree_features(tokens, tree, start, end))
    n = len(tokens)
    prev_w = tokens[start - 1] if start > 0 else "NONE"
    prev_p = pos[start - 1] if start > 0 else "NONE"
    next_w = tokens[end + 1] if end < n - 1 else "NONE"
    next_p = pos[end + 1] if end < n - 1 else "NONE"
    feats += [f"PREVWORD={prev_w}", f"PREVPOS={prev_p}",
              f"CONN&PREVW={conn}&{prev_w}", f"CONN&PREVP={conn}&{prev_p}",
              f"NXTWORD={next_w}", f"NXTPOS={next_p}",
              f"CONN&NXTW={conn}&{next_w}", f"CONN&NXTP={conn}&{next_p}"]
    head = conn_head(pos, start, end)
    conn_pos = pos[head]
    deps = g.dep_edges(head)
    if deps:
        parent_has_subj = False
        sibling_has_subj = False
        parent = deps[0][1]
        parent_pos = pos[parent]
        for (reln, gv, dep) in g.gov_edges(parent):
            if dep == head:
                continue
            if _SUBJ_RE.fullmatch(reln):
                parent_has_subj = True
            sib_pos = pos[dep]
            feats.append(f"POSTRIPLE={conn_pos}&{parent_pos}&{sib_pos}")
            feats.append(
                f"POSTRIPLE&RELN={conn_pos}&{parent_pos}&{sib_pos}-{reln}")
            feats.append(f"POSTRIPLE'&RELN={conn_pos}&{parent_pos}-{reln}")
            feats.append(
                f"POSTRIPLE'&RELN={conn_pos[:1]}&{parent_pos[:1]}-{reln}")
            if not sibling_has_subj:
                for (r1, g1, d1) in g.gov_edges(dep):
                    if _SUBJ_RE.fullmatch(r1):
                        sibling_has_subj = True
                        break
        feats.append(f"PSUBJ={str(parent_has_subj).lower()}")
        feats.append(f"SSUBJ={str(sibling_has_subj).lower()}")
    return feats
