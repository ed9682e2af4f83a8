"""Tree and dependency convolution kernels (train-time experiments).

Ports of the reference's remaining custom kernels, runnable inside the
same broadcast-prototype / Gram-matrix machinery as the LCS dep-path
kernel (operators/kernel_score):

* ``tree_kernel`` — the Collins-Duffy subset-tree convolution kernel
  over Penn constituency trees (``libsvm/TreeKernel.java:26-110``):
  K(T1,T2) = sum over node pairs of C(n1,n2), where same-production
  pairs score lambda^2 times the product of (1 + C(child_i, child_i)).
  A leaf's "value" is its word, an internal node's its label, matching
  Stanford ``Tree.value()``.
* ``dependency_kernel`` — the shipped (non-commented) evaluate of
  ``libsvm/DependencyKernel.java:127-264``: gated on matching
  LCS-position strata (between/before/after the entity pair), then a
  recursive walk from the two LCS nodes — coarse-POS (2-char) node
  match, node score 1.0 for case-insensitive word equality, and an
  ordered-children decay ``lambda*(1-lambda^L)/(1-lambda)`` over
  longest match runs.
"""

from __future__ import annotations

from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.tree import Node


def _flatten(root: Node):
    """Flatten to Stanford-shaped (value, child-index-list) records.

    ``kernels.tree.parse_penn`` fuses a preterminal and its word into one
    Node; Stanford ``Tree`` keeps a separate leaf whose ``value()`` is
    the word — the kernel counts both, so expand fused nodes back into
    (label, [word-leaf]) here."""
    nodes: list[tuple[str, list[int]]] = []

    def rec(n: Node) -> int:
        me = len(nodes)
        if n.word is not None and n.label:
            nodes.append((n.label, []))
            leaf = rec_leaf(n.word)
            nodes[me] = (n.label, [leaf])
        elif n.word is not None:
            nodes.append((n.word, []))
        else:
            nodes.append((n.label, []))
            kids = [rec(c) for c in n.children]
            nodes[me] = (n.label, kids)
        return me

    def rec_leaf(word: str) -> int:
        nodes.append((word, []))
        return len(nodes) - 1

    rec(root)
    return nodes


def tree_kernel(t1: Node, t2: Node, lam: float = 0.5) -> float:
    """Collins-Duffy SST kernel (TreeKernel.evaluate, java:26-50)."""
    nodes1 = _flatten(t1)
    nodes2 = _flatten(t2)
    mem: dict[tuple[int, int], float] = {}

    def same_production(i: int, j: int) -> bool:
        # TreeKernel.sameProduction (java:73-88)
        (va, ca), (vb, cb) = nodes1[i], nodes2[j]
        if va != vb or len(ca) != len(cb):
            return False
        return all(nodes1[x][0] == nodes2[y][0] for x, y in zip(ca, cb))

    def compute(i: int, j: int) -> float:
        key = (i, j)
        v = mem.get(key)
        if v is not None:
            return v
        if same_production(i, j):
            v = lam * lam
            ca, cb = nodes1[i][1], nodes2[j][1]
            if ca and cb:
                for x, y in zip(ca, cb):
                    v *= 1 + compute(x, y)
        else:
            v = 0.0
        mem[key] = v
        return v

    return sum(compute(i, j)
               for i in range(len(nodes1)) for j in range(len(nodes2)))


def subtree_signatures(root: Node) -> dict[str, int]:
    """Multiset of FULL-subtree canonical strings, Stanford node shape.

    Every node (word leaves included, as in ``_flatten``) contributes the
    bracketed string of the complete subtree rooted at it: a word leaf
    contributes the bare word, a preterminal ``(POS word)``, an internal
    node ``(LBL child ...)``. The root's signature therefore equals the
    original bracketed string (modulo whitespace normalization), which
    ties this kernel to kernels/constit.build_tree output exactly.
    """
    counts: dict[str, int] = {}

    def rec(n: Node) -> str:
        if n.word is not None and n.label:
            # fused preterminal: count the word leaf AND the preterminal
            counts[n.word] = counts.get(n.word, 0) + 1
            sig = f"({n.label} {n.word})"
        elif n.word is not None:
            sig = n.word
        else:
            sig = "(" + n.label + " " + " ".join(rec(c) for c in n.children) + ")"
        counts[sig] = counts.get(sig, 0) + 1
        return sig

    rec(root)
    return counts


def subtree_kernel(t1: Node, t2: Node) -> int:
    """Subtree (ST) kernel: number of pairs of identical FULL subtrees
    (Vishwanathan & Smola's S-tree kernel; the un-decayed counting
    member of the reference's kernel family). Integer-exact — for the
    depth-3 trees from kernels/constit this has a closed SQL form
    (leaf-word matches + (POS, word) matches + full-chunk matches + root
    equality), which is what the kg_tree_scores gate hash-verifies."""
    c1 = subtree_signatures(t1)
    c2 = subtree_signatures(t2)
    if len(c2) < len(c1):
        c1, c2 = c2, c1
    return sum(n * c2[sig] for sig, n in c1.items() if sig in c2)


def tree_kernel_dyadic(t1: Node, t2: Node,
                       lam_num: int = 1, lam_den: int = 2):
    """Collins-Duffy SST kernel, EXACT rational arithmetic (same recursion
    as :func:`tree_kernel`, ``Fraction`` instead of float).

    The reference computes the kernel in Java doubles; so does
    :func:`tree_kernel`. But ``floor(scale * k)`` of a float is not
    certifiable against a SQL oracle once intermediate products exceed
    the 53-bit mantissa (a sentence identical to a prototype produces
    exactly such products). With lambda = 1/2 every C value is a dyadic
    rational, so this variant is bit-reproducible on both sides; the
    float runtime path is pytest-bounded against it
    (tests/test_kernelscore.py::test_sst_float_matches_dyadic)."""
    from fractions import Fraction
    lam = Fraction(lam_num, lam_den)
    nodes1 = _flatten(t1)
    nodes2 = _flatten(t2)
    mem: dict[tuple[int, int], object] = {}
    zero = Fraction(0)

    def same_production(i: int, j: int) -> bool:
        (va, ca), (vb, cb) = nodes1[i], nodes2[j]
        if va != vb or len(ca) != len(cb):
            return False
        return all(nodes1[x][0] == nodes2[y][0] for x, y in zip(ca, cb))

    def compute(i: int, j: int):
        key = (i, j)
        v = mem.get(key)
        if v is not None:
            return v
        if same_production(i, j):
            v = lam * lam
            ca, cb = nodes1[i][1], nodes2[j][1]
            if ca and cb:
                for x, y in zip(ca, cb):
                    v *= 1 + compute(x, y)
        else:
            v = zero
        mem[key] = v
        return v

    return sum((compute(i, j)
                for i in range(len(nodes1)) for j in range(len(nodes2))),
               zero)


def _position(e1: int, e2: int, lcs: int) -> str:
    # DependencyKernel.getPosition (java:157-165)
    if e1 <= lcs <= e2:
        return "between"
    if lcs < e1:
        return "before"
    return "after"


def dependency_kernel(g1: DepGraph, tokens1, pos1,
                      g2: DepGraph, tokens2, pos2,
                      e1a: int, e2a: int, lcs1: int,
                      e1b: int, e2b: int, lcs2: int,
                      lam: float = 0.5) -> float:
    """DependencyKernel.evaluate (java:127-156 active path)."""
    if lcs1 < 0 or lcs2 < 0:
        return 0.0
    if _position(e1a, e2a, lcs1) != _position(e1b, e2b, lcs2):
        return 0.0

    visiting: set[tuple[int, int]] = set()

    def is_match(n1: int, n2: int) -> bool:
        return pos1[n1][:2] == pos2[n2][:2]  # coarse POS (java:214-223)

    def node_score(n1: int, n2: int) -> float:
        # every term but case-insensitive word equality is commented out
        # in the reference (java:225-263)
        return 1.0 if tokens1[n1].lower() == tokens2[n2].lower() else 0.0

    def evaluate(n1: int, n2: int) -> float:
        if not is_match(n1, n2):
            return 0.0
        # cycle guard (deviation from the reference, which recurses
        # unboundedly and would overflow on cyclic conj edges — cf. the
        # conj_(and|or) skip in CorpusReader.addAncestors): a node pair
        # already on the walk contributes 0
        key = (n1, n2)
        if key in visiting:
            return 0.0
        visiting.add(key)
        try:
            return node_score(n1, n2) + eval_children(n1, n2)
        finally:
            visiting.discard(key)

    def eval_children(n1: int, n2: int) -> float:
        deps1 = g1.gov_edges(n1)
        deps2 = g2.gov_edges(n2)
        m, n = len(deps1), len(deps2)
        if m == 0 or n == 0:
            return 0.0
        L = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m - 1, -1, -1):
            for j in range(n - 1, -1, -1):
                if is_match(deps1[i][2], deps2[j][2]):
                    L[i][j] = L[i + 1][j + 1] + 1
        total = 0.0
        c = [[0.0] * (n + 1) for _ in range(m + 1)]
        for i in range(m - 1, -1, -1):
            for j in range(n - 1, -1, -1):
                if is_match(deps1[i][2], deps2[j][2]):
                    decay = lam * (1 - lam ** L[i][j]) / (1 - lam)
                    c[i][j] = (lam * c[i + 1][j + 1]
                               + decay * evaluate(deps1[i][2], deps2[j][2]))
                total += c[i][j]
        return total

    return evaluate(lcs1, lcs2)
