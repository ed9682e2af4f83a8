"""Synset membership map (broadcast dictionary).

Port of ``ppi/filter/SynSetMapper.java``: a word -> set-of-synset-ids map
read from the reference's ``synset.txt`` format — a word line followed by
one ``(id)`` line per synset and a blank separator (java:24-43) — with
``syn_match`` = non-empty intersection (java:49-58).  In the engine the
parsed map is broadcast and consulted inside feature vUDFs (the SYN
features of the kernel experiments); there is no per-row I/O.
"""

from __future__ import annotations


def parse_synsets(lines: list[str]) -> dict[str, frozenset[int]]:
    """word -> synset-id set; words with zero ids are omitted (java:37-39)."""
    out: dict[str, frozenset[int]] = {}
    i = 0
    n = len(lines)
    while i < n:
        key = lines[i]
        j = i + 1
        ids = set()
        while j < n and lines[j] != "":
            ids.add(int(lines[j][1:-1]))  # strip the surrounding parens
            j += 1
        if ids:
            out[key] = frozenset(ids)
        i = j + 1
    return out


def load_synsets(path: str) -> dict[str, frozenset[int]]:
    with open(path) as f:
        return parse_synsets(f.read().splitlines())


def syn_set(mapping: dict[str, frozenset[int]], word: str):
    """getSynSet (java:46-48): lowercase lookup; None when absent."""
    return mapping.get(word.lower())


def syn_match(mapping: dict[str, frozenset[int]],
              word1: str, word2: str) -> bool:
    """synMatch (java:49-58): words share at least one synset."""
    s1 = syn_set(mapping, word1)
    s2 = syn_set(mapping, word2)
    if s1 is None or s2 is None:
        return False
    return not s1.isdisjoint(s2)
