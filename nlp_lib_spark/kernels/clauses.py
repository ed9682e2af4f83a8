"""Clause / discourse-segment boundary detection (frozen rule substitute).

Re-expresses the reference's clause segmentation layer
(``ling/ann/ClauseBoundaryAnnotator.java:77-120`` — two MaxEnt boundary
classifiers with forced S at 0 and E at the last token;
``ling/ann/ClauseAnnotator.java`` rule/CRF variants) as deterministic rules:

* a clause starts at token 0 (forced, java:95);
* a new clause starts at a subordinating conjunction, at a discourse
  connective, at ``;`` / ``:``, and at a coordinating conjunction that is
  followed by a subject+verb (not a bare NP coordination);
* the last clause ends at the final token (forced, java:114).

Output spans are (start, end_inclusive) over the token list.
"""

from __future__ import annotations

SUBORDINATORS = {
    "because", "although", "though", "since", "while", "whereas", "if",
    "unless", "until", "when", "whenever", "after", "before", "that",
    "which", "who", "whom", "whose",
}


def clause_spans(tokens: list[str], pos: list[str]) -> list[tuple[int, int]]:
    n = len(tokens)
    if n == 0:
        return []
    starts = {0}
    for i in range(1, n):
        low = tokens[i].lower()
        if low in SUBORDINATORS:
            starts.add(i)
        elif tokens[i] in (";", ":"):
            if i + 1 < n:
                starts.add(i + 1)
        elif pos[i] == "CC":
            # coordination of clauses: a verb follows before the sentence end
            has_verb_after = any(pos[k].startswith("V")
                                 for k in range(i + 1, n))
            has_noun_then_verb = False
            seen_noun = False
            for k in range(i + 1, n):
                if pos[k].startswith("N"):
                    seen_noun = True
                elif pos[k].startswith("V") and seen_noun:
                    has_noun_then_verb = True
                    break
            if has_verb_after and has_noun_then_verb:
                starts.add(i)
    ordered = sorted(starts)
    spans = []
    for k, s in enumerate(ordered):
        e = (ordered[k + 1] - 1) if k + 1 < len(ordered) else n - 1
        if e >= s:
            spans.append((s, e))
    return spans
