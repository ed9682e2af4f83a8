"""LLL-pipeline lexicon annotators.

Ports of ``relx/LexAnnotator.java`` and ``relx/LexSynAnnotator.java``:

* ``LexAnnotator`` — case-insensitive longest-match-downward phrase
  tagger emitting a ``LEXE`` B/I/O layer (annotate at java:72-103).
  Quirk replicated: when the last token of a candidate phrase contains
  ``-``, the phrase is retried with everything from the LAST hyphen
  stripped, and on a hit the FULL token still joins the span
  (java:79-84); after a match the scan resumes past the span.
* ``LexSynAnnotator`` — same matcher over a tab-separated synonym file
  (``alias\\tcanonical...`` lines, ``%`` comments skipped); every column
  enters the dictionary and non-first columns map to the first via
  ``has_synonym`` (java:20-52).

Both are broadcast-dictionary kernels: construct once per executor from
the broadcast term list, apply per sentence inside Arrow batches.
"""

from __future__ import annotations


class LexAnnotator:
    __slots__ = ("dictionary", "max_len")

    def __init__(self, terms: list[str] | None = None):
        self.dictionary: set[str] = set()
        self.max_len = 0
        for term in terms or []:
            self.add_term(term)

    def add_term(self, term: str) -> None:
        self.dictionary.add(term.lower())
        self.max_len = max(self.max_len, len(term.split()))

    def contains(self, phrase: str) -> bool:
        return phrase.lower() in self.dictionary

    def annotate(self, tokens: list[str]) -> list[str]:
        """LEXE B/I/O tags (LexAnnotator.annotate, java:72-103)."""
        n = len(tokens)
        tags = ["O"] * n
        i = 0
        while i < n:
            j = min(n - 1, i + self.max_len - 1)
            while j >= i:
                phrase = " ".join(tokens[i:j + 1])
                if self.contains(phrase):
                    break
                if "-" in tokens[j]:
                    trimmed = phrase[:phrase.rfind("-")]
                    if self.contains(trimmed):
                        break
                j -= 1
            if j >= i:
                for k in range(i, j + 1):
                    tags[k] = "B" if k == i else "I"
                i = j + 1  # java: i = j, then loop i++
            else:
                i += 1
        return tags


class LexSynAnnotator(LexAnnotator):
    __slots__ = ("synonym_map",)

    def __init__(self, lines: list[str] | None = None):
        super().__init__()
        self.synonym_map: dict[str, str] = {}
        for line in lines or []:
            if not line or line.startswith("%"):
                continue
            cols = line.split("\t")
            for c in cols:
                self.add_term(c)
            for alias in cols[1:]:
                self.synonym_map[alias.lower()] = cols[0]

    def has_synonym(self, key: str) -> str | None:
        """Canonical form for an alias, None otherwise (java:61-67)."""
        return self.synonym_map.get(key.lower())
