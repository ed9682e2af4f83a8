"""Frozen constituency-tree -> typed-dependency converter (PTB2Dep slot).

The reference's ``corpus/pdtb/PTB2Dep.java:29-99`` walks a Penn-treebank
directory and converts every tree to typed dependencies with Stanford's
``GrammaticalStructureFactory`` (``gs.typedDependencies()``, the
non-collapsed variant — PTB2Dep.java:82 switched to it "because and, or
were being ignored"), writing one tab-separated ``reln(gov-G, dep-D)``
line per sentence that ``SimpleDepFileReader`` later consumes.

Stanford's converter is an external library, so — exactly like the frozen
dependency builder (kernels/depparse.py) and the frozen constituency
assembler (kernels/constit.py) — we substitute a deterministic converter
whose output is a pure function of the tree:

* heads percolate with the Collins tables already shipped in
  :mod:`nlp_lib_spark.kernels.tree` (``head_child`` / ``head_leaf``, the
  HeadAnalyzer.java port) — the SAME head decisions the tree kernels and
  Wellner-head discourse features see, which is the property Stanford's
  semantic-head finder provides in the reference stack;
* every non-head child of a constituent contributes one edge
  ``(reln, head_leaf(parent), head_leaf(child))``;
* ``reln`` comes from the frozen table below (UD-flavoured labels keyed on
  parent label / child label / linear side), standing in for Stanford's
  grammatical-relation patterns;
* the root edge is ``root(ROOT-0, head_leaf(tree))`` — gov index -1 after
  the reader's 1-based shift, matching ``sources/readers.parse_dep``.

Emission order is deterministic: root edge first (as
``gs.typedDependencies()`` lists it), then a pre-order walk of the tree
emitting each node's non-head children left to right.

Determinism is the contract: for the depth-3 trees built by
kernels/constit.build_tree the whole conversion collapses to a closed form
(per-group head by priority rank, group-level attachment to the S head)
that the DuckDB oracle replicates in window SQL, making the gate a full
value-hash check of the converter.
"""

from __future__ import annotations

from nlp_lib_spark.kernels.tree import Node, head_child, leaves

Edge = tuple[str, int, int]  # (reln, gov_leaf_idx, dep_leaf_idx)

# Frozen relation table. Keys are checked in order:
#   (parent_label, child_label)          exact pair
#   (parent_label, child_label_class)    class in {"VB*", "JJ*", "RB*",
#                                                  "NN*", "PUNCT"}
#   (parent_label, "*")                  parent fallback
#   ("*", child_label / class / "*")     global fallback
# NP children under S additionally split on linear side (nsubj/obj), and
# VB* children under VP split on side (aux/xcomp) — handled in code.
_RELN: dict[tuple[str, str], str] = {
    ("S", "NP"): "nsubj",          # overridden to "obj" right of the head
    ("S", "VP"): "conj",           # non-head VP sibling (serial/coord)
    ("S", "TO"): "mark",
    ("S", "IN"): "case",
    ("S", "CC"): "cc",
    ("S", "RB*"): "advmod",
    ("S", "MD"): "aux",
    ("S", "PUNCT"): "punct",
    ("NP", "DT"): "det",
    ("NP", "PDT"): "det",
    ("NP", "PRP$"): "nmod:poss",
    ("NP", "POS"): "case",
    ("NP", "JJ*"): "amod",
    ("NP", "CD"): "nummod",
    ("NP", "NN*"): "compound",
    ("NP", "RB*"): "advmod",
    ("NP", "NP"): "nmod",
    ("NP", "PUNCT"): "punct",
    ("VP", "TO"): "mark",
    ("VP", "MD"): "aux",
    ("VP", "VB*"): "aux",          # overridden to "xcomp" right of the head
    ("VP", "RB*"): "advmod",
    ("VP", "NP"): "obj",
    ("VP", "PP"): "obl",
    ("VP", "PUNCT"): "punct",
    ("PP", "NP"): "pobj",
    ("PP", "IN"): "case",
    ("*", "NP"): "nmod",
    ("*", "PUNCT"): "punct",
    ("*", "*"): "dep",
}


def _label_class(label: str) -> str | None:
    if label[:1] and not label[:1].isalnum():
        return "PUNCT"
    for pre, cls in (("VB", "VB*"), ("JJ", "JJ*"), ("RB", "RB*"),
                     ("NN", "NN*")):
        if label.startswith(pre):
            return cls
    return None


def _reln(parent: str, child: str, dep_before_head: bool) -> str:
    cls = _label_class(child)
    for key in ((parent, child),
                (parent, cls) if cls else None,
                (parent, "*"),
                ("*", child),
                ("*", cls) if cls else None,
                ("*", "*")):
        if key is None or key not in _RELN:
            continue
        r = _RELN[key]
        if r == "nsubj" and not dep_before_head:
            return "obj"
        if r == "aux" and key == ("VP", "VB*") and not dep_before_head:
            return "xcomp"
        return r
    return "dep"


def tree_to_deps(root: Node) -> list[Edge]:
    """Typed dependencies of one Penn tree; indices are 0-based leaf
    positions, the root edge carries gov -1."""
    if root is None:
        return []
    lvs = leaves(root)
    if not lvs:
        return []
    pos_of = {id(l): i for i, l in enumerate(lvs)}

    memo: dict[int, Node | None] = {}

    def hleaf(n: Node) -> Node | None:
        cur: Node | None = n
        while cur is not None and not cur.is_leaf:
            key = id(cur)
            if key not in memo:
                memo[key] = head_child(cur)
            cur = memo[key]
        return cur

    rh = hleaf(root)
    if rh is None:
        return []
    edges: list[Edge] = [("root", -1, pos_of[id(rh)])]

    def rec(n: Node) -> None:
        if n.is_leaf:
            return  # preterminal: word on the node itself, no structure
        hc = head_child(n)
        hn = hleaf(n)
        if hn is None:
            return  # childless internal node (never emitted by build_tree)
        h = pos_of[id(hn)]
        for c in n.children:
            if c is hc:
                continue
            dn = hleaf(c)
            if dn is None:
                continue
            d = pos_of[id(dn)]
            edges.append((_reln(n.label, c.label, d < h), h, d))
        for c in n.children:
            rec(c)

    rec(root)
    return edges


def format_dep_line(edges: list[Edge], tokens: list[str]) -> str:
    """One ``.dep`` file line: tab-separated ``reln(gov-G, dep-D)`` with
    1-based indices and ``ROOT-0`` for the root governor — byte-compatible
    with ``sources/readers.parse_dep`` (PTB2Dep.java:84-92 writes
    ``td.toString()`` the same way)."""
    parts = []
    for reln, g, d in edges:
        gov = "ROOT-0" if g < 0 else f"{tokens[g]}-{g + 1}"
        parts.append(f"{reln}({gov}, {tokens[d]}-{d + 1})")
    return "\t".join(parts)
