"""Entity blinding: rewrite mention spans to ``PROTEIN<k>`` placeholders.

Re-implements ``prepare()`` (``main/WBioRelEx.java:248-284``): each ``B-``
span becomes one placeholder token ``PROTEIN<k>`` (its ``I-`` continuation
tokens are absorbed), a map placeholder -> original surface text is kept,
and the number of distinct entities is counted. Non-entity tokens pass
through unchanged.

Fused tokens tagged ``B-FUSED`` by the gazetteer become
``PROTEIN<k>/PROTEIN<k+1>`` with one map entry per part — the shape
RelexRule5 (``relx/ppi/RelexRule5.java:19-42``) and the all-pairs candidate
loop (``main/WBioRelEx.java:363-380``, which tests ``word().contains``)
expect for same-token pairs.
"""

from __future__ import annotations


def blind(tokens: list[str], tags: list[str]) -> tuple[list[str], dict[str, str], int]:
    """Return (blinded_tokens, placeholder->surface map, entity_count)."""
    out: list[str] = []
    mapping: dict[str, str] = {}
    count = 0
    entity_count = 0
    i = 0
    n = len(tokens)
    while i < n:
        tag = tags[i]
        if tag == "B-PROTEIN":
            entity_count += 1
            surface = [tokens[i]]
            j = i + 1
            while j < n and tags[j] == "I-PROTEIN":
                surface.append(tokens[j])
                j += 1
            placeholder = f"PROTEIN{count}"
            mapping[placeholder] = " ".join(surface)
            out.append(placeholder)
            count += 1
            i = j
        elif tag == "B-FUSED":
            parts = tokens[i].split("/")
            entity_count += len(parts)
            placeholders = []
            for p in parts:
                placeholder = f"PROTEIN{count}"
                mapping[placeholder] = p
                placeholders.append(placeholder)
                count += 1
            out.append("/".join(placeholders))
            i += 1
        else:
            out.append(tokens[i])
            i += 1
    return out, mapping, entity_count
