"""Relation/domain-term annotation.

Re-implements ``BioDomainAnnotator`` (``ppi/BioDomainAnnotator.java:40-95``):
the term dictionary is loaded together with the stem of every term
(java:48-53); a token is DOMAIN-tagged when its lowercase form is in the
dictionary, else when its stem is, else — for hyphenated tokens — when any
``-``-split part (or its stem) is (java:62-85). The tag *value* is the
matched dictionary key, which downstream becomes the triple predicate.
"""

from __future__ import annotations

from collections.abc import Iterable

from nlp_lib_spark.kernels.stem import stem


class DomainAnnotator:
    __slots__ = ("terms",)

    def __init__(self, terms: Iterable[str], include_stems: bool = True):
        self.terms: set[str] = set()
        for t in terms:
            t = t.strip().lower()
            if not t:
                continue
            self.terms.add(t)
            if include_stems:
                self.terms.add(stem(t))

    def tag(self, tokens: list[str]) -> list[str | None]:
        """DOMAIN tag value per token (None when not a domain term)."""
        out: list[str | None] = []
        for tok in tokens:
            w = tok.lower()
            val: str | None = None
            if w in self.terms:
                val = w
            else:
                sw = stem(w)
                if sw in self.terms:
                    val = sw
                elif "-" in w:
                    for part in w.split("-"):
                        if part in self.terms:
                            val = part  # java keeps overwriting; last wins
                        else:
                            sp = stem(part)
                            if sp in self.terms:
                                val = sp
            out.append(val)
        return out

    def is_domain_term(self, word: str) -> bool:
        w = word.lower()
        return w in self.terms or stem(w) in self.terms
