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
from nlp_lib_spark.kernels.tree import Node, head_leaf, lca, leaves

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
    # identity, NOT equality: list.index would resolve a structurally
    # identical sibling (e.g. the same word occurring twice at the same
    # tree level) to its FIRST occurrence and return the wrong neighbor
    # (caught by adversarial fuzz seed 404)
    i = next(idx for idx, c in enumerate(p.children) if c is n)
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


_PUNCT_CHUNK_RE = re.compile(r"[,;:.]")
_REF_TAG_RE = re.compile(r"[0-9]+")


def _remove_reference_tag(tag: str) -> str:
    """Strip a trailing ``-<digits>`` reference index from a constituent
    label (PDTBConnectiveSense2FeatureVector.removeReferenceTag,
    java:1092-1107). Our frozen labels never carry one; kept for exact
    fidelity (note the Penn escapes like ``-LSB-`` end in ``-`` followed
    by nothing, so they pass through unchanged just as in Java)."""
    if "-" not in tag:
        return tag
    parts = tag.split("-")
    if not _REF_TAG_RE.fullmatch(parts[-1]):
        return tag
    return "-".join(parts[:-1])


def _stanford_value(n: Node) -> str:
    """Stanford Tree.value(): label for internal/preterminal nodes, the
    word for a bare leaf."""
    return n.label if n.label else (n.word or "")


def _contains_vp(n: Node) -> bool:
    """BFS for a VP.* label among descendants, recursing only into
    phrasal (non-preterminal) children
    (PDTBConnectiveSense2FeatureVector.java:858-871)."""
    q = deque(n.children)
    while q:
        c = q.popleft()
        if c.label.startswith("VP"):
            return True
        if c.word is None and c.children:  # phrasal, not a preterminal
            q.extend(c.children)
    return False


def _domination_path(root: Node, node: Node) -> list[Node]:
    """Stanford Tree.dominationPath: root..node inclusive."""
    path = []
    cur: Node | None = node
    while cur is not None:
        path.append(cur)
        if cur is root:
            break
        cur = cur.parent
    return list(reversed(path))


def connective_features_v2(tokens: list[str], pos: list[str], tree: Node,
                           start: int, end: int,
                           category: str) -> list[str]:
    """ACTIVE feature families of the richer connective-disambiguation
    pipe (``ml/PDTBConnective2FeatureVector2.pipe``, java:65-112 — the
    syntax-tree/my-syntactic/clause/temporal/path/constituent/dependency
    blocks are commented out in the reference):

    1. identity (java:152-156): raw connective string + ``LC=<lower>``;
    2. Penn block (java:795-901): unary-climbed LCA SELF / PARENT /
       LEFT@-1 (PLAIN sibling — no modifier skip, unlike variant 1) /
       RIGHT@+1 (+ VP-containment flag), every label through
       removeReferenceTag, each emitted plain and lowercase-conn-conjoined
       interleaved; then the manual syn-syn conjunctions INCLUDING the
       extra PARENT&RIGHT_VP pair (java:886-896; the RIGHT_TRACE pairs
       are dead — the trace feature itself is commented out);
    3. custom block (java:157-295): CAT, PREVW/NEXTW raw words plain and
       tree-conn-conjoined, CONN&PREV/NEXT-CHUNK with the FULL
       removeReferenceTag'd ancestor(2) label (no [:1] truncation, unlike
       the surface family), no PREV-CHUNK feature in the start==0 branch;
       then the domination path of the unary-climbed LCA: ``ANC@k=<tag>``
       for ancestors at distance k>2 only (i < sz-2, java:228-234 — dead
       on depth-3 trees, live on gold trees) and, at the self node, the
       right sibling's Collins-head preterminal label as
       ``<category>&RIGHT-HEAD@1=<label>`` (java:252-258; NOT
       reference-tag-stripped);
    4. surface block (java:113-151): CAT again, CONN&PREVW/NEXTW over the
       raw POS tags, CONN&PREV/NEXT-CHUNK over the FIRST CHARACTER of the
       stripped chunk label, with the NONE else-branch only on the left.

    Word-source fidelity (as in sense_features): ``getConnString`` reads
    TREE leaf values (Penn-escaped), ``Sentence.toString``/``word()``/
    ``getTag("POS")`` read the raw token/POS lists.
    """
    lv = leaves(tree)
    n = len(tokens)
    feats: list[str] = []

    conn_sent = " ".join(tokens[start:end + 1])
    conn_tree = " ".join(lv[i].word or "" for i in range(start, end + 1))

    # 1. identity
    feats.append(conn_sent)
    feats.append("LC=" + conn_sent.lower())

    # 2. Penn block
    conn_l = conn_sent.lower()
    node = lca(tree, start, end)
    base: list[str] = []
    if node is None:  # reference-unreachable (would NPE at java:821)
        base.append("SELF=<NONE>")
    else:
        parent = node.parent
        while parent is not None and len(parent.children) == 1:
            node = parent
            parent = node.parent
        base.append("SELF=" + _remove_reference_tag(_stanford_value(node)))
        base.append("PARENT=" + _remove_reference_tag(_stanford_value(parent))
                    if parent is not None else "PARENT=<NONE>")
        left = _sibling(node, -1)
        base.append("LEFT@-1-" + _remove_reference_tag(_stanford_value(left))
                    if left is not None else "LEFT@-1-<NONE>")
        right = _sibling(node, 1)
        if right is not None:
            base.append("RIGHT@+1-"
                        + _remove_reference_tag(_stanford_value(right)))
            if right.label:  # Stanford isLeaf() false
                if _contains_vp(right) or right.label.startswith("VP"):
                    base.append("RIGHT@+1-has-VP")
                else:
                    base.append("RIGHT@+1-has-no-VP")
        else:
            base.append("RIGHT@+1-<NONE>")
    for f in base:
        feats.append(f)
        feats.append(conn_l + "&" + f)
    SELF, PARENT, LEFT, RIGHT, RIGHT_VP = 0, 1, 2, 3, 4
    if len(base) >= 4:
        feats.append(base[LEFT] + "&" + base[RIGHT])
        feats.append(base[SELF] + "&" + base[LEFT])
        feats.append(base[SELF] + "&" + base[RIGHT])
        feats.append(base[PARENT] + "&" + base[LEFT])
        feats.append(base[PARENT] + "&" + base[RIGHT])
        feats.append(base[SELF] + "&" + base[PARENT])
    if len(base) > 4:
        feats.append(base[RIGHT] + "&" + base[RIGHT_VP])
        feats.append(base[PARENT] + "&" + base[RIGHT_VP])

    # 3. custom block
    feats.append("CAT=" + category)
    if start > 0:
        feats.append("PREVW=" + tokens[start - 1])
        feats.append(f"CONN&PREVW={conn_tree}&{tokens[start - 1]}")
        leaf = lv[start - 1]
        chunk = leaf.word or ""
        if not _PUNCT_CHUNK_RE.fullmatch(chunk):
            anc2 = leaf.parent if leaf.word is not None else leaf
            chunk = _stanford_value(anc2) if anc2 is not None else chunk
        feats.append(f"CONN&PREV-CHUNK={conn_tree}&"
                     + _remove_reference_tag(chunk))
    else:
        feats.append("PREVW=NONE")
        feats.append(f"CONN&PREVW={conn_tree}&NONE")
        # (no PREV-CHUNK feature in this branch, java:195-199)
    if end < n - 1:
        feats.append("NEXTW=" + tokens[end + 1])
        feats.append(f"CONN&NEXTW={conn_tree}&{tokens[end + 1]}")
        leaf = lv[end + 1]
        chunk = leaf.word or ""
        if not _PUNCT_CHUNK_RE.fullmatch(chunk):
            anc2 = leaf.parent if leaf.word is not None else leaf
            chunk = _stanford_value(anc2) if anc2 is not None else chunk
        feats.append(f"CONN&NEXT-CHUNK={conn_tree}&"
                     + _remove_reference_tag(chunk))
    # domination-path block (java:215-266)
    node = lca(tree, start, end)
    if node is not None:
        parent = node.parent
        while parent is not None and len(parent.children) == 1:
            node = parent
            parent = node.parent
        path = _domination_path(tree, node)
        sz = len(path)
        for i in range(1, sz):
            t = path[i]
            if _stanford_value(t):
                tag = _remove_reference_tag(_stanford_value(t))
                if i < sz - 2:
                    feats.append(f"ANC@{sz - i}={tag}")
                if sz - i < 2:
                    right_sib = _sibling(t, 1)
                    if right_sib is not None:
                        hl = head_leaf(right_sib)
                        if hl is not None:
                            feats.append(f"{category}&RIGHT-HEAD@{sz - i}="
                                         + hl.label)

    # 4. surface block
    feats.append("CAT=" + category)
    if start > 0:
        feats.append(f"CONN&PREVW={conn_tree}&{pos[start - 1]}")
        leaf = lv[start - 1]
        chunk = leaf.word or ""
        if not _PUNCT_CHUNK_RE.fullmatch(chunk):
            anc2 = leaf.parent if leaf.word is not None else leaf
            chunk = _stanford_value(anc2) if anc2 is not None else chunk
        feats.append("CONN&PREV-CHUNK=" + _remove_reference_tag(chunk)[:1])
    else:
        feats.append(f"CONN&PREVW={conn_tree}&NONE")
        feats.append("CONN&PREV-CHUNK=NONE")
    if end < n - 1:
        feats.append(f"CONN&NEXTW={conn_tree}&{pos[end + 1]}")
        leaf = lv[end + 1]
        chunk = leaf.word or ""
        if not _PUNCT_CHUNK_RE.fullmatch(chunk):
            anc2 = leaf.parent if leaf.word is not None else leaf
            chunk = _stanford_value(anc2) if anc2 is not None else chunk
        feats.append("CONN&NEXT-CHUNK=" + _remove_reference_tag(chunk)[:1])
    return feats


def sense_features(tokens: list[str], pos: list[str], tree: Node,
                   start: int, end: int, arg2_head: int,
                   category: str) -> list[str]:
    """ACTIVE feature families of the sense classifier's pipe
    (``ml/PDTBConnectiveSense2FeatureVector.pipe``, java:65-103 — the
    syntax-tree/custom/clause/temporal/path/constituent/dependency blocks
    are commented out in the reference; the manual syn-syn pair
    conjunctions are behind ``if (1 < 2) return`` and therefore dead):

    1. identity (java:165-169): the raw connective string;
    2. Penn block (java:808-897): unary-climbed LCA SELF / PARENT /
       LEFT@-1 / RIGHT@+1 (+ VP-containment flag), each emitted plain
       and conn-conjoined, interleaved;
    3. surface (java:119-164): CAT=<lexicon category>, CONN&PREVW /
       CONN&PREV-CHUNK (first char of the ancestor(2) label, or the
       punctuation itself), same for NEXT — with NO else branch at the
       sentence end, exactly as in the reference;
    4. head (java:105-118): CONN=<conn>&HEAD_POS=<preterminal of the
       Arg2 head leaf> and HEAD=<Arg2 head word>.

    Fidelity notes: the reference mixes word sources — ``getConnString``
    reads TREE leaf values (Penn-escaped) while ``Sentence.toString`` /
    ``.word()`` read the raw tokens — mirrored here via ``tree`` vs
    ``tokens``. A null LCA would NPE in the reference (java:833); ports
    return the two SELF=<NONE> features for that unreachable branch.
    """
    lv = leaves(tree)
    feats: list[str] = []

    conn_sent = " ".join(tokens[start:end + 1])       # Sentence.toString
    # getConnString reads tree LEAF values (Penn-escaped words)
    conn_tree = " ".join(lv[i].word or "" for i in range(start, end + 1))

    # 1. identity
    feats.append(conn_sent)

    # 2. Penn block
    conn_l = conn_sent.lower()
    node = lca(tree, start, end)
    base: list[str] = []
    if node is None:  # reference-unreachable (would NPE at java:833)
        base.append("SELF=<NONE>")
    else:
        parent = node.parent
        while parent is not None and len(parent.children) == 1:
            node = parent
            parent = node.parent
        base.append("SELF=" + _remove_reference_tag(_stanford_value(node)))
        base.append("PARENT=" + _remove_reference_tag(_stanford_value(parent))
                    if parent is not None else "PARENT=<NONE>")
        left = _sibling(node, -1)
        base.append("LEFT@-1-" + _remove_reference_tag(_stanford_value(left))
                    if left is not None else "LEFT@-1-<NONE>")
        right = _sibling(node, 1)
        if right is not None:
            base.append("RIGHT@+1-"
                        + _remove_reference_tag(_stanford_value(right)))
            if right.label:  # Stanford isLeaf() false: preterminal/phrasal
                if _contains_vp(right) or right.label.startswith("VP"):
                    base.append("RIGHT@+1-has-VP")
                else:
                    base.append("RIGHT@+1-has-no-VP")
        else:
            base.append("RIGHT@+1-<NONE>")
    for f in base:
        feats.append(f)
        feats.append(conn_l + "&" + f)

    # 3. surface
    feats.append("CAT=" + category)
    n = len(tokens)
    if start > 0:
        feats.append(f"CONN&PREVW={conn_tree}&{tokens[start - 1]}")
        leaf = lv[start - 1]
        chunk = leaf.word or ""
        if not _PUNCT_CHUNK_RE.fullmatch(chunk):
            anc2 = leaf.parent if leaf.word is not None else leaf
            chunk = _stanford_value(anc2) if anc2 is not None else chunk
        feats.append("CONN&PREV-CHUNK=" + _remove_reference_tag(chunk)[:1])
    else:
        feats.append(f"CONN&PREVW={conn_tree}&NONE")
        feats.append("CONN&PREV-CHUNK=NONE")
    if end < n - 1:
        feats.append(f"CONN&NEXTW={conn_tree}&{tokens[end + 1]}")
        leaf = lv[end + 1]
        chunk = leaf.word or ""
        if not _PUNCT_CHUNK_RE.fullmatch(chunk):
            anc2 = leaf.parent if leaf.word is not None else leaf
            chunk = _stanford_value(anc2) if anc2 is not None else chunk
        feats.append("CONN&NEXT-CHUNK=" + _remove_reference_tag(chunk)[:1])
    # (no else branch: the reference emits nothing at the sentence end)

    # 4. head
    conn_tl = conn_tree.lower()
    # leaf.parent(root).value() = the preterminal label (our fused node)
    feats.append(f"CONN={conn_tl}&HEAD_POS={lv[arg2_head].label}")
    feats.append("HEAD=" + tokens[arg2_head])
    return feats
