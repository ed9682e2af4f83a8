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
    __slots__ = ("terms", "pos_terms")

    def __init__(self, terms: Iterable[str], include_stems: bool = True):
        """Plain entries match any POS; ``term|POS`` entries (the
        ExBioDomainAnnotator variant, ppi/ExBioDomainAnnotator.java /
        ppi/PrepareBiomedicalTerms.java:32-56) match only tokens whose POS
        starts with the given tag."""
        self.terms: set[str] = set()
        self.pos_terms: dict[str, str] = {}
        for t in terms:
            t = t.strip().lower()
            if not t:
                continue
            if "|" in t:
                word, pos = t.split("|", 1)
                self.pos_terms[word] = pos.upper()
                if include_stems:
                    self.pos_terms[stem(word)] = pos.upper()
                continue
            self.terms.add(t)
            if include_stems:
                self.terms.add(stem(t))

    def tag(self, tokens: list[str],
            pos: list[str] | None = None) -> list[str | None]:
        """DOMAIN tag value per token (None when not a domain term)."""
        out: list[str | None] = []
        for k, tok in enumerate(tokens):
            w = tok.lower()
            val: str | None = None
            if w in self.terms:
                val = w
            elif pos is not None and self.pos_terms:
                hit = self.pos_terms.get(w) or self.pos_terms.get(stem(w))
                if hit is not None and pos[k].startswith(hit):
                    val = w if w in self.pos_terms else stem(w)
            if val is None:
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
