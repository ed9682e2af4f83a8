"""ConnectiveTreeKernel — SVM-light-TK training-file generator.

Port of ``kernels/ConnectiveTreeKernel.java:36-198``: for every connective
candidate in a sentence (gold ``CONN`` B/I span, or a <=4-token lexicon
match elsewhere), emit one SVM-light-TK line containing a three-tree
forest (the LCA constituent with simplified left/right siblings) plus a
sparse window-feature vector.  The output feeds the external
svm-light-TK trainer; this module is the corpus-prep transform, not a
kernel function.

Quirks replicated: the unary-parent climb above the LCA
(``isUnaryRewrite``), the NONEL/XL / NONER/XR placeholder subtrees, the
left-sibling simplification to its LAST child label vs the right sibling
keeping every ``V*`` child (else the first), ``removeFunctionTag``
truncating any label at its first ``-`` (including leaf words), the
``DB``-prefixed double connectives counting positive while ``DI``
continuations are skipped, and the stateful grow-only feature index
(first-seen order across the whole generation run, starting at 1).
The lemma slot of the (reference-commented-out) word features uses the
frozen stem; POS is re-assigned from the tree preterminals exactly like
``treeAnalyzer.assignPOS``.
"""

from __future__ import annotations

import re

from nlp_lib_spark.kernels.tree import Node, lca, leaves, parse_penn

_TREE_PARAMS = ("1:1 2:0.7 3:0.6 |BV| 1:1 2:1 3:1 |BV| "
                "1:1 |BV| 1:0 |BV| ")  # java:146-147


def _tree_to_string(t: Node) -> str:
    # treeToString/traverse (java:355-372): parens only on internal nodes.
    # parse_penn folds a Java preterminal (one leaf child) into a single
    # word-bearing node, so those unfold back to "(POS word)"; bare-label
    # nodes created by the simplifiers (label == word) print unparenthesized
    # like Java leaf nodes.
    if not t.children:
        if t.word is not None and t.word != t.label:
            return "(" + t.label + " " + t.word + ")"
        return t.word if t.word is not None else t.label
    return "(" + t.label + "".join(
        " " + _tree_to_string(c) for c in t.children) + ")"


def _remove_function_tag(t: Node) -> None:
    # java:374-382: truncate every label (and leaf word) at the first '-'
    if "-" in t.label:
        t.label = t.label[:t.label.index("-")]
    if t.word is not None and "-" in t.word:
        t.word = t.word[:t.word.index("-")]
    for c in t.children:
        _remove_function_tag(c)


def _label_only(label: str) -> Node:
    n = Node(label=label)
    n.word = None
    return n


def _leaf(label: str) -> Node:
    n = Node(label=label)
    n.word = label
    return n


def _simplify(t: Node, left: bool) -> Node:
    # simplifyTree (java:260-289)
    out = Node(label=t.label)
    children = t.children
    if not children:  # preterminal sibling: its "children" are its word
        out.children = [_leaf(t.word if t.word is not None else t.label)]
        return out
    if left:
        out.children = [_label_only(children[-1].label)]
    else:
        vs = [c for c in children if c.label.startswith("V")]
        out.children = [_label_only(c.label) for c in vs] if vs else \
            [_label_only(children[0].label)]
    return out


def _sibling(parent: Node, self_node: Node, offset: int) -> Node | None:
    idx = next((i for i, c in enumerate(parent.children)
                if c is self_node), None)
    if idx is None:
        return None
    j = idx + offset
    return parent.children[j] if 0 <= j < len(parent.children) else None


def _placeholder(label: str, child: str) -> Node:
    n = Node(label=label)
    n.children = [_leaf(child)]
    return n


class ConnectiveTKGenerator:
    """Stateful generator (the Java object's grow-only featureMap)."""

    def __init__(self, conn_set: set[str]):
        self.conn_set = {c.lower() for c in conn_set}
        self._feature_map: dict[str, int] = {}

    def _index(self, feature: str) -> int:
        idx = self._feature_map.get(feature)
        if idx is None:
            idx = len(self._feature_map) + 1
            self._feature_map[feature] = idx
        return idx

    def _feature_vector(self, tokens: list[str], pos: list[str],
                        start: int, end: int) -> list[tuple[int, float]]:
        # getFeatureVector (java:158-196), windowSize 1
        vec: list[tuple[int, float]] = []
        conn = " ".join(tokens[start:end + 1])
        if start - 1 >= 0:
            p = pos[start - 1][:2]
            vec.append((self._index(p + "@-1"), 1.0))
            vec.append((self._index(conn + p + "@p-1"), 1.0))
        if start == 0:
            vec.append((self._index("NONE@-1"), 1.0))
            vec.append((self._index(conn + "NONE@w-1"), 1.0))
        if end + 1 < len(tokens):
            p = pos[end + 1][:2]
            vec.append((self._index(p + "@+1"), 1.0))
            vec.append((self._index(conn + p + "@p+1"), 1.0))
        vec.append((self._index(conn), 1.0))
        return sorted(vec)

    def _forest(self, root: Node, start: int,
                end: int) -> tuple[str, str, str] | None:
        # write() tree block (java:112-140) + createSubTree (java:228-258)
        node = lca(root, start, end)
        if node is None:
            return None
        # climb to the LCA's preterminal/phrase ancestor through unary chains
        parent = node.parent
        while parent is not None and len(parent.children) == 1:
            node = parent
            parent = node.parent
        if parent is None:
            return None
        sub = Node(label=parent.label)
        left_sib = _sibling(parent, node, -1)
        sub.children.append(_simplify(left_sib, True) if left_sib is not None
                            else _placeholder("NONEL", "XL"))
        sub.children.append(node)
        right_sib = _sibling(parent, node, 1)
        sub.children.append(_simplify(right_sib, False)
                            if right_sib is not None
                            else _placeholder("NONER", "XR"))
        _remove_function_tag(sub)
        main_tree = _tree_to_string(sub)
        left_child = sub.children[0]
        sub.children = sub.children[1:]          # removeChild(0)
        right_tree = _tree_to_string(sub)
        sub.children = [left_child] + sub.children  # addChild(0, ...)
        sub.children = sub.children[:2]          # removeChild(2)
        left_tree = _tree_to_string(sub)
        return main_tree, right_tree, left_tree

    def instances(self, tokens: list[str], conn_tags: list[str],
                  tree_str: str) -> list[str]:
        """addInstances (java:73-110) + write (java:112-153): one
        SVM-light-TK line per connective candidate."""
        root = parse_penn(tree_str)
        if root is None:
            return []
        for leaf in leaves(root):
            if leaf.word is not None:
                leaf.word = leaf.word.lower()
        # assignPOS from preterminal labels (java:94-95)
        lvs = leaves(root)
        pos = [(lv.parent.label if lv.parent is not None else lv.label)
               for lv in lvs]
        n = len(tokens)
        out: list[str] = []
        i = 0
        while i < n:
            j = -1
            tag = conn_tags[i]
            if not re.fullmatch(r"(B.*)|(DB.*)", tag):
                for k in range(4):
                    if i + k >= n:
                        break
                    if " ".join(tokens[i:i + k + 1]).lower() in self.conn_set:
                        j = i + k
            else:
                j = i
                for k in range(i + 1, n):
                    if conn_tags[k].startswith("I"):
                        j = k
                    else:
                        break
            if j != -1:
                if tag.startswith("B") or tag.startswith("DB"):
                    label = "+1"
                elif not tag.startswith("DI"):
                    label = "-1"
                else:
                    label = None  # skip 'then' of if..then
                if label is not None and j < len(pos):
                    forest = self._forest(root, i, j)
                    if forest is not None:
                        vec = self._feature_vector(tokens, pos, i, j)
                        vec_str = "".join(f"{a}:{v:g} " for (a, v) in vec)
                        out.append(
                            f"{label} \t|BT| {forest[0]} |BT| {forest[1]}"
                            f" |BT| {forest[2]} |ET| {_TREE_PARAMS}"
                            f"{vec_str}|EV|")
                i = j
            i += 1
        return out
