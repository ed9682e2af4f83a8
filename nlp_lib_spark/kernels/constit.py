"""Frozen deterministic constituency-tree builder (the ParserAnnotator slot).

The reference's ``ling/ann/ParserAnnotator.java:48-98`` attaches a Penn
constituency parse to every sentence by calling an external Charniak/BLLIP
server; trees then feed the tree kernels and the POSTRIPLE / Wellner-head
discourse features. This sandbox has no external parser, so — exactly like
the frozen dependency builder (kernels/depparse.py) — we substitute a
deterministic shallow assembler whose output is a function of the frozen
POS layer only:

* the sentence is segmented by :func:`nlp_lib_spark.kernels.bio.chunk_bio`
  into maximal NP / VP chunks and O singletons;
* each chunk becomes an internal node over its ``(POS word)`` preterminals,
  each O token hangs directly under the root as a preterminal;
* the root is ``S``.

Depth is exactly 3 (S -> chunk -> preterminal -> word, with O preterminals
at depth 2), every bracket-significant character in tokens/POS is escaped
with the Penn conventions (``-LRB-`` etc.), and the output parses back
through :func:`nlp_lib_spark.kernels.tree.parse_penn` loss-free — so every
tree analyzer (LCA, Gorn, Collins heads, tree kernels) now runs from raw
transcript text end-to-end.

Determinism is the contract: the DuckDB oracle assembles the identical
string with window SQL over the oracled POS stream, which makes the gate a
full value-hash check of the builder.
"""

from __future__ import annotations

from nlp_lib_spark.kernels.bio import chunk_bio

# Penn Treebank escapes for bracket characters (both token and POS
# positions: the frozen tagger tags punctuation with the token itself, so
# an unescaped '(' would otherwise appear as a node label).
PENN_ESCAPES: tuple[tuple[str, str], ...] = (
    ("(", "-LRB-"), (")", "-RRB-"),
    ("[", "-LSB-"), ("]", "-RSB-"),
    ("{", "-LCB-"), ("}", "-RCB-"),
)


def penn_escape(s: str) -> str:
    for raw, esc in PENN_ESCAPES:
        s = s.replace(raw, esc)
    return s


def chunk_groups(tokens: list[str], pos: list[str]
                 ) -> list[tuple[str | None, list[tuple[str, str]]]]:
    """Segment a tagged sentence into tree children.

    Returns ``[(chunk_type_or_None, [(pos, word), ...]), ...]`` in token
    order: NP/VP groups carry their chunk type, every O token is its own
    ``(None, [(pos, word)])`` group. POS and word are Penn-escaped.
    """
    tags = chunk_bio(pos)
    groups: list[tuple[str | None, list[tuple[str, str]]]] = []
    for i, tag in enumerate(tags):
        leaf = (penn_escape(pos[i]), penn_escape(tokens[i]))
        if tag == "O":
            groups.append((None, [leaf]))
        elif tag.startswith("B-"):
            groups.append((tag[2:], [leaf]))
        else:  # I- continuation (chunk_bio never emits a dangling I-)
            groups[-1][1].append(leaf)
    return groups


def build_tree(tokens: list[str], pos: list[str]) -> str:
    """Bracketed Penn string for one tagged sentence (empty -> ``(S )``)."""
    parts: list[str] = []
    for typ, leaves in chunk_groups(tokens, pos):
        leaf_str = " ".join(f"({p} {w})" for p, w in leaves)
        parts.append(leaf_str if typ is None else f"({typ} {leaf_str})")
    return "(S " + " ".join(parts) + ")"
