"""Dictionary/gazetteer entity mention detection (prefix-extension match).

Re-implements the semantics of the reference's ``EntityLexicon``
(``main/WBioRelEx.java:420-476``):

* The lexicon is compiled to a *prefix set*: every whitespace-split prefix of
  every (lowercased) entity name is inserted (``init()``, java:431-444) — so
  a standalone token that happens to be the first word of a longer entity
  still B-matches. That over-generation is part of the reference contract.
* Matching (``tagIOB``, java:446-476) walks tokens left to right. On a
  B-match it greedily extends one token at a time while the growing phrase
  stays in the prefix set, emitting ``I-``; the first token that fails the
  extension is emitted as ``O`` and *consumed* (the scan resumes after it —
  the ``i = j`` quirk in the reference loop). We replicate that exactly.

Extension beyond the reference (documented): a token containing ``/`` whose
slash-separated parts are ALL full lexicon entries is tagged ``B-FUSED`` —
this synthesizes the pre-blinded fused tokens (``PROTEIN3/PROTEIN4``) found
in the reference's PPI corpora, which RelexRule5 and form-4 pairs consume.
"""

from __future__ import annotations

from collections.abc import Iterable


class Gazetteer:
    __slots__ = ("prefix_set", "full_set")

    def __init__(self, entity_names: Iterable[str]):
        self.prefix_set: set[str] = set()
        self.full_set: set[str] = set()
        for entity in entity_names:
            toks = entity.split()
            if not toks:
                continue
            word = toks[0].lower()
            self.prefix_set.add(word)
            for t in toks[1:]:
                word = word + " " + t.lower()
                self.prefix_set.add(word)
            self.full_set.add(entity.lower())

    def tag_iob(self, tokens: list[str]) -> list[str]:
        """IOB tags per token, replicating EntityLexicon.tagIOB exactly."""
        tags = ["O"] * len(tokens)
        n = len(tokens)
        i = 0
        while i < n:
            word = tokens[i].lower()
            if word in self.prefix_set:
                tags[i] = "B-PROTEIN"
                j = i + 1
                while j < n:
                    word = word + " " + tokens[j].lower()
                    if word in self.prefix_set:
                        tags[j] = "I-PROTEIN"
                        j += 1
                    else:
                        tags[j] = "O"  # consumed: scan resumes past it
                        break
                i = j + 1  # java: i = j, then loop i++
            else:
                if "/" in tokens[i]:
                    parts = tokens[i].lower().split("/")
                    if len(parts) >= 2 and all(p in self.full_set for p in parts):
                        tags[i] = "B-FUSED"
                i += 1
        return tags
