"""Regenerate the frozen BPE merge table (operators/bpe.BPE_MERGES).

Classic BPE training (Sennrich et al. 2016, the public algorithm): start
from characters, repeatedly merge the most frequent adjacent symbol pair
(ties broken lexicographically so the table is deterministic), rank =
creation order. Trained on the corpus vocabulary at sf0.001 — the word
distribution is identical at every scale factor, so the table transfers.

Run: python scripts/train_bpe.py [n_merges] and paste the output over
BPE_MERGES.
"""

from __future__ import annotations

import collections
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def train(freq: dict[str, int], n_merges: int
          ) -> list[tuple[str, str]]:
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in freq.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        new: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        vocab = new
    return merges


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rows = duckdb.sql(f"""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM '{SF_DIR}/documents.parquet')
        WHERE word <> '' GROUP BY word""").fetchall()
    merges = train(dict(rows), n_merges)
    print("BPE_MERGES: tuple[tuple[str, str], ...] = (")
    for l, r in merges:
        print(f"    ({l!r}, {r!r}),")
    print(")")


if __name__ == "__main__":
    main()
