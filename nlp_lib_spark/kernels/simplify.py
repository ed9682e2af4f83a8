"""Parenthetical-aside pruning over blinded token lists.

Re-implements ``simplify()`` (``main/WBioRelEx.java:103-128``): a ``(``
opens a span running to the next ``)`` (or end of sentence); if no token in
the span contains ``PROTEIN`` the whole span including both parens is
dropped, otherwise the span is kept verbatim. Cheap cost-pruning applied
before parsing/extraction.
"""

from __future__ import annotations


def simplify(tokens: list[str]) -> list[str]:
    out: list[str] = []
    i = 0
    n = len(tokens)
    while i < n:
        if tokens[i] == "(":
            end = n - 1
            found = False
            for j in range(i + 1, n):
                if tokens[j] == ")":
                    end = j
                    break
                if "PROTEIN" in tokens[j]:
                    found = True
            if not found:
                i = end + 1  # java: i = end, then loop i++
            else:
                out.append(tokens[i])
                i += 1
        else:
            out.append(tokens[i])
            i += 1
    return out
