"""Penn-bracketing constituency-tree utilities.

Pure-Python re-expression of the reference's tree analyzers
(``ling/analyzers/SyntaxTreeAnalyzer.java``): parse a Penn string, leaf
extraction, leaf-span LCA (java:41-64), Gorn addressing (java:244-291 and
``corpus/pdtb/GornAddress.java``), label paths (java:162-193), plus a
Collins-style head finder with the per-category rule tables of
``ling/analyzers/HeadAnalyzer.java:294-379`` in compact form.

Trees arrive as string columns (one Penn tree per sentence line,
``corpus/pdtb/PTBFileReader.java``); these utilities run inside Arrow UDF
batches. ``(ROOT)`` (the reference's parse-failure marker,
PreparePPI2.java:97-99) parses to a childless root.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Node:
    label: str
    children: list["Node"] = field(default_factory=list)
    parent: "Node | None" = None
    word: str | None = None  # set on leaves

    @property
    def is_leaf(self) -> bool:
        return self.word is not None


def parse_penn(s: str) -> Node | None:
    """Parse one Penn-bracketed tree string; None on malformed input."""
    toks: list[str] = []
    cur = ""
    for ch in s:
        if ch in "()":
            if cur.strip():
                toks.append(cur.strip())
            cur = ""
            toks.append(ch)
        else:
            cur += ch
    if cur.strip():
        toks.append(cur.strip())
    stack: list[Node] = []
    root: Node | None = None
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "(":
            label = ""
            if i + 1 < len(toks) and toks[i + 1] not in "()":
                label = toks[i + 1]
                i += 1
            node = Node(label=label.split()[0] if label else "")
            rest = label.split()[1:] if label else []
            if rest:  # "(NN dog" style: preterminal with word
                node.word = rest[0]
            if stack:
                node.parent = stack[-1]
                stack[-1].children.append(node)
            else:
                root = node
            stack.append(node)
        elif t == ")":
            if not stack:
                return None
            stack.pop()
        i += 1
    return root if not stack else None


def leaves(root: Node) -> list[Node]:
    out: list[Node] = []

    def rec(n: Node) -> None:
        if n.is_leaf:
            out.append(n)
        for c in n.children:
            rec(c)

    rec(root)
    return out


def gorn_address(root: Node, node: Node) -> str:
    """Gorn address of ``node``: child indices joined by ',' ('' = root)."""
    path: list[int] = []
    cur = node
    while cur.parent is not None:
        # identity, not equality: a structurally identical sibling (same
        # word twice under one parent) would .index() to the FIRST copy
        path.append(next(i for i, c in enumerate(cur.parent.children)
                         if c is cur))
        cur = cur.parent
    if cur is not root:
        raise ValueError("node not under root")
    return ",".join(str(i) for i in reversed(path))


def gorn_node(root: Node, address: str) -> Node | None:
    cur = root
    if address == "":
        return cur
    for part in address.split(","):
        i = int(part)
        if i >= len(cur.children):
            return None
        cur = cur.children[i]
    return cur


def _path_to_root(n: Node) -> list[Node]:
    out = [n]
    while out[-1].parent is not None:
        out.append(out[-1].parent)
    return out


def lca(root: Node, leaf_start: int, leaf_end: int) -> Node | None:
    """Lowest common ancestor of a leaf index span (inclusive)."""
    lv = leaves(root)
    if not lv or leaf_start < 0 or leaf_end >= len(lv):
        return None
    a = set(map(id, _path_to_root(lv[leaf_start])))
    cur: Node | None = lv[leaf_end]
    while cur is not None:
        if id(cur) in a:
            return cur
        cur = cur.parent
    return None


def label_path(root: Node, a: Node, b: Node) -> list[str]:
    """Constituent label path a -> LCA -> b (SyntaxTreeAnalyzer:162-193)."""
    pa = _path_to_root(a)
    pb = _path_to_root(b)
    ids_b = {id(n): k for k, n in enumerate(pb)}
    for i, n in enumerate(pa):
        if id(n) in ids_b:
            j = ids_b[id(n)]
            up = [x.label for x in pa[:i + 1]]
            down = [x.label for x in reversed(pb[:j])]
            return up + down
    return []


# Collins-style head tables (direction, label priority list) — compact form
# of HeadAnalyzer.java:294-379.
_HEAD_RULES: dict[str, tuple[str, list[str]]] = {
    "ADJP": ("left", ["NNS", "QP", "NN", "$", "ADVP", "JJ", "VBN", "VBG",
                      "ADJP", "JJR", "NP", "JJS", "DT", "FW", "RBR", "RBS",
                      "SBAR", "RB"]),
    "ADVP": ("right", ["RB", "RBR", "RBS", "FW", "ADVP", "TO", "CD", "JJR",
                       "JJ", "IN", "NP", "JJS", "NN"]),
    "PP": ("right", ["IN", "TO", "VBG", "VBN", "RP", "FW"]),
    "S": ("left", ["TO", "IN", "VP", "S", "SBAR", "ADJP", "UCP", "NP"]),
    "SBAR": ("left", ["WHNP", "WHPP", "WHADVP", "WHADJP", "IN", "DT", "S",
                      "SQ", "SINV", "SBAR", "FRAG"]),
    "VP": ("left", ["TO", "VBD", "VBN", "MD", "VBZ", "VB", "VBG", "VBP",
                    "VP", "ADJP", "NN", "NNS", "NP"]),
    "NP": ("right", ["NN", "NNP", "NNPS", "NNS", "NX", "POS", "JJR", "NP",
                     "$", "ADJP", "PRN", "CD", "JJ", "JJS", "RB", "QP"]),
    "ROOT": ("left", ["S", "SQ", "SINV", "SBAR", "FRAG", "VP", "NP"]),
}


def head_child(node: Node) -> Node | None:
    """Collins-style head child of a constituent."""
    if not node.children:
        return None
    direction, prio = _HEAD_RULES.get(node.label, ("left", []))
    kids = node.children if direction == "left" else list(reversed(node.children))
    for label in prio:
        for k in kids:
            if k.label == label:
                return k
    return kids[0]


def head_leaf(node: Node) -> Node | None:
    """Descend head children to the lexical head leaf."""
    cur = node
    seen = 0
    while cur is not None and not cur.is_leaf and seen < 100:
        cur = head_child(cur)
        seen += 1
    return cur if cur is not None and cur.is_leaf else None


def leaf_position(root: Node, leaf: Node) -> int:
    for i, l in enumerate(leaves(root)):
        if l is leaf:
            return i
    return -1
