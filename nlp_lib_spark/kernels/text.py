"""Deterministic text primitives: citation strip, sentence split, tokenize.

Reference parity notes (semantics only, re-implemented from scratch):
* strip_citations — the citation-bracket scrub the reference applies before
  NER (``main/WBioRelEx.java:293``: ``replaceAll("\\[[\\s\\d,;-]+\\]","")``).
* split_sentences — replaces the reference's OpenNLP MaxEnt splitter
  (``utils/OSentenceBoundaryDetector.java:19-52``) with a frozen rule:
  a sentence is a maximal run of non-terminal characters plus its trailing
  ``.!?`` run. The exact regex is mirrored in SQL (``regexp_extract_all``)
  by the driver-gate oracles, so keep it RE2-compatible (no lookbehind).
* tokenize — replaces the reference's OpenNLP/ABNER tokenizers
  (``utils/OTokenizer.java:19-50``) with a frozen regex: words keep internal
  hyphens/slashes/apostrophes (so slash-fused entity tokens survive, which
  RelexRule5 / form-4 pairs depend on: ``relx/ppi/RelexRule5.java:20``),
  every other non-space symbol is its own token.
"""

from __future__ import annotations

import re

# main/WBioRelEx.java:293
_CITATION_RE = re.compile(r"\[[\s\d,;-]+\]")

# RE2-compatible; mirrored by gate oracles in DuckDB SQL.
SENTENCE_PATTERN = r"[^.!?]+[.!?]+|[^.!?]+$"
_SENT_RE = re.compile(SENTENCE_PATTERN)

TOKEN_PATTERN = r"\w+(?:[-/']\w+)*|[^\w\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def strip_citations(text: str) -> str:
    """Remove reference-style citation brackets like ``[12, 3]``."""
    return _CITATION_RE.sub("", text)


def split_sentences(text: str) -> list[str]:
    """Split text into sentences on ``.!?`` runs; strips surrounding space.

    Deterministic and SQL-mirrorable; empty/whitespace-only pieces dropped.
    """
    out = []
    for m in _SENT_RE.finditer(text.replace("\n", " ")):
        s = m.group(0).strip()
        if s:
            out.append(s)
    return out


def tokenize(sentence: str) -> list[str]:
    """Frozen word tokenizer; keeps ``a-b``, ``x/y``, ``don't`` fused."""
    return _TOKEN_RE.findall(sentence)
