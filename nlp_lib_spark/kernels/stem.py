"""Frozen suffix-stripping stemmer.

Stands in for the Snowball english stemmer the reference uses for domain-term
matching (``ppi/BioDomainAnnotator.java:48-53,62-75``). Not Porter — a
deterministic longest-suffix strip that is identical in the oracle and the
distributed pipeline, which is all parity requires.
"""

from __future__ import annotations

from functools import lru_cache

_SUFFIXES = (
    "ations", "ation", "ities", "ingly", "ings", "ions", "ion", "ies",
    "ing", "ed", "es", "e", "s", "ly",
)

_MIN_STEM = 3


@lru_cache(maxsize=65536)
def stem(word: str) -> str:
    w = word.lower()
    for suf in _SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= _MIN_STEM:
            return w[: -len(suf)]
    return w
