"""BIO tag-sequence decoding to spans.

Re-implements the reference's chunk decoding (``ling/Sentence.getChunks``,
ling/Sentence.java:106-119, and ``ling/Chunk.java:56-84``): a ``B-X`` opens
a span of type X, following ``I-X`` extend it, anything else closes it.
An ``I-`` without a preceding ``B-`` (corpus noise) opens a span, matching
the reference's lenient constructor behavior.
"""

from __future__ import annotations


def decode_bio(tags: list[str]) -> list[tuple[int, int, str]]:
    """tags -> [(start, end_inclusive, type)]."""
    spans: list[tuple[int, int, str]] = []
    start = -1
    cur = None
    for i, t in enumerate(tags):
        if t.startswith("B-"):
            if cur is not None:
                spans.append((start, i - 1, cur))
            start, cur = i, t[2:]
        elif t.startswith("I-"):
            typ = t[2:]
            if cur is None:
                start, cur = i, typ
            elif typ != cur:
                spans.append((start, i - 1, cur))
                start, cur = i, typ
        else:
            if cur is not None:
                spans.append((start, i - 1, cur))
                cur = None
    if cur is not None:
        spans.append((start, len(tags) - 1, cur))
    return spans


_NP_POS = ("DT", "JJ", "CD", "PRP")


def chunk_bio(pos: list[str]) -> list[str]:
    """Shallow BIO chunk tags from the POS layer (the OChunker /
    GeniaTagger CHUNK slot, ling/ann/OChunker.java — frozen rule
    substitute): maximal noun-ish runs (DT/JJ/CD/PRP/NN*) become NP
    chunks, verb-ish runs (V*/MD with RB allowed inside) become VP
    chunks, everything else O.  A run opens with B-, continues with I-;
    Sentence.getChunks-style decoding is ``decode_bio``."""
    n = len(pos)
    tags = ["O"] * n
    cur = None  # current chunk type or None
    for i in range(n):
        p = pos[i]
        if p.startswith("N") or p in _NP_POS:
            typ = "NP"
        elif p.startswith("V") or p == "MD" or (p == "RB" and cur == "VP"):
            typ = "VP"
        else:
            typ = None
        if typ is None:
            cur = None
        elif typ == cur:
            tags[i] = "I-" + typ
        else:
            tags[i] = "B-" + typ
            cur = typ
    return tags
