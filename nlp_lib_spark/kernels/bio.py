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
