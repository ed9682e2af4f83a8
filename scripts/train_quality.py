"""Train the distilled document-quality classifier and freeze its
integer weights (operators/quality_model.QM_WEIGHTS / QM_BIAS).

Distillation target: the text-intrinsic half of the composed filter
chain — pass_quality (>= 20 tokens AND >= 1 stopword) AND
pass_repetition (top word strictly under 1/8 of all words), computed
exactly via DuckDB. Trainer: deterministic SGD logistic regression on
standardized features, standardization folded back into raw-space
weights, frozen as round(w * 1e6) micro-units (integer inference is
then bit-exact across engines; the freeze is measured lossless on both
corpora).

Run: python scripts/train_quality.py — prints held-out metrics and the
literal dict to paste over QM_WEIGHTS/QM_BIAS.
"""

from __future__ import annotations

import math
import random
import statistics

import duckdb

TRAIN_SF = "/root/testdata/sf0.001"
HELDOUT_SF = "/root/testdata/sf0.01"

_FEATS_SQL = """
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS arr
           FROM '{sf}/documents.parquet'),
f AS (SELECT doc_id, len(arr) AS f_tokens,
        len(list_filter(arr, x -> x IN ('the', 'a'))) AS f_stop,
        length(text) AS f_chars,
        len(list_distinct(arr)) AS f_distinct,
        list_max(list_transform(list_distinct(arr),
             w -> len(list_filter(arr, x -> x = w)))) AS f_topw
      FROM d)
SELECT f_tokens, f_stop, f_chars, f_distinct, f_topw,
       CASE WHEN f_tokens >= 20 AND f_stop >= 1 AND f_topw * 8 <= f_tokens
            THEN 1 ELSE 0 END AS label
FROM f
"""


def load(sf: str) -> list[tuple[int, ...]]:
    return duckdb.sql(_FEATS_SQL.format(sf=sf)).fetchall()


def train(rows, nf: int = 5, epochs: int = 600, lr: float = 0.05,
          seed: int = 42):
    rng = random.Random(seed)
    mu = [statistics.mean(r[i] for r in rows) for i in range(nf)]
    sd = [statistics.pstdev(r[i] for r in rows) or 1.0 for i in range(nf)]
    w = [0.0] * nf
    b = 0.0
    idx = list(range(len(rows)))
    for e in range(epochs):
        cur = lr / (1 + e / 200)
        rng.shuffle(idx)
        for i in idx:
            r = rows[i]
            z = b + sum(w[j] * (r[j] - mu[j]) / sd[j] for j in range(nf))
            p = 1 / (1 + math.exp(-max(-30.0, min(30.0, z))))
            g = p - r[-1]
            b -= cur * g
            for j in range(nf):
                w[j] -= cur * (g * (r[j] - mu[j]) / sd[j] + 1e-5 * w[j])
    wr = [w[j] / sd[j] for j in range(nf)]
    br = b - sum(w[j] * mu[j] / sd[j] for j in range(nf))
    return wr, br


def metrics(wi: list[int], bi: int, rows) -> tuple[float, float, float]:
    tp = fp = fn = tn = 0
    for r in rows:
        pred = bi + sum(wi[j] * r[j] for j in range(len(wi))) > 0
        y = r[-1] == 1
        tp += pred and y
        fp += pred and not y
        fn += (not pred) and y
        tn += (not pred) and not y
    n = len(rows)
    return ((tp + tn) / n, tp / (tp + fp or 1), tp / (tp + fn or 1))


def main() -> None:
    tr, te = load(TRAIN_SF), load(HELDOUT_SF)
    wr, br = train(tr)
    wi = [round(x * 1_000_000) for x in wr]
    bi = round(br * 1_000_000)
    names = ("qm_tokens", "qm_stop", "qm_chars", "qm_distinct", "qm_topw")
    print("QM_WEIGHTS = {")
    for nme, w in zip(names, wi):
        print(f'    "{nme}": {w},')
    print("}")
    print(f"QM_BIAS = {bi}")
    for tag, rows in (("train", tr), ("heldout", te)):
        a, p, r = metrics(wi, bi, rows)
        print(f"{tag}: acc={a:.4f} precision={p:.4f} recall={r:.4f}")


if __name__ == "__main__":
    main()
