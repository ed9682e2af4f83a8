"""MaxEnt (logistic) scoring over sparse string features.

Runtime analogue of the reference's persisted Mallet MaxEnt classifier
(``ml/crf/MyClassifierTrainer.java:32-51``, loaded at
``main/WBioRelEx.java:382-393``): score = sigmoid(bias + sum of weights of
present features), accept when p > 0.5. Weights ship as a plain dict
(JSON), broadcast to executors — no model server, no JVM object.
"""

from __future__ import annotations

import json
import math
import os


def sigmoid(x: float) -> float:
    if x >= 0:
        z = math.exp(-x)
        return 1.0 / (1.0 + z)
    z = math.exp(x)
    return z / (1.0 + z)


def score(features: list[str], weights: dict[str, float],
          bias: float) -> float:
    s = bias
    for f in features:
        w = weights.get(f)
        if w is not None:
            s += w
    return sigmoid(s)


def train_logreg(x: list[list[str]], y: list[int], epochs: int = 60,
                 lr: float = 0.3, l2: float = 1e-4,
                 seed: int = 42) -> tuple[dict[str, float], float]:
    """Tiny deterministic SGD logistic regression (training is offline and
    corpus-scale-small — thousands of pairs, per SURVEY.md §3.2)."""
    import random
    rng = random.Random(seed)
    weights: dict[str, float] = {}
    bias = 0.0
    idx = list(range(len(x)))
    for _ in range(epochs):
        rng.shuffle(idx)
        for i in idx:
            p = score(x[i], weights, bias)
            g = p - y[i]
            bias -= lr * g
            for f in x[i]:
                weights[f] = weights.get(f, 0.0) * (1 - lr * l2) - lr * g
    return weights, bias


def prune_by_count(x: list[list[str]], prune_count: int) -> list[list[str]]:
    """Keep features whose corpus occurrence count is STRICTLY greater
    than ``prune_count`` (ml/PruneFeatureVectors.pruneByCount,
    java:22-63: ``counts[fi] > pruneCount``)."""
    from collections import Counter
    counts: Counter = Counter()
    for feats in x:
        counts.update(feats)
    keep = {f for f, c in counts.items() if c > prune_count}
    return [[f for f in feats if f in keep] for feats in x]


def info_gain(x: list[list[str]], y: list[int]) -> dict[str, float]:
    """Information gain of each binary feature against the binary label:
    IG(f) = H(Y) - [p(f) H(Y|f) + p(!f) H(Y|!f)] — the selection
    criterion behind ``PruneFeatureVectors.pruneByInfoGain``
    (java:65-84, Mallet ``InfoGain``)."""
    n = len(y)
    if n == 0:
        return {}
    pos = sum(y)

    def h(p1: int, total: int) -> float:
        if total == 0 or p1 == 0 or p1 == total:
            return 0.0
        p = p1 / total
        return -(p * math.log2(p) + (1 - p) * math.log2(1 - p))

    hy = h(pos, n)
    present: dict[str, int] = {}
    present_pos: dict[str, int] = {}
    for feats, label in zip(x, y):
        for f in set(feats):
            present[f] = present.get(f, 0) + 1
            if label:
                present_pos[f] = present_pos.get(f, 0) + 1
    out: dict[str, float] = {}
    for f, nf in present.items():
        pf = present_pos.get(f, 0)
        cond = (nf / n) * h(pf, nf) + ((n - nf) / n) * h(pos - pf, n - nf)
        out[f] = hy - cond
    return out


def prune_by_info_gain(x: list[list[str]], y: list[int],
                       k: int = 1500) -> list[list[str]]:
    """Keep the top-k features by information gain (the reference exports
    its shipped model with top-1500, ppi/MLExtractor.java:182).
    Deterministic tiebreak: higher IG, then lexicographic feature name."""
    ig = info_gain(x, y)
    keep = {f for f, _ in sorted(ig.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:k]}
    return [[f for f in feats if f in keep] for feats in x]


def train_softmax(x: list[list[str]], y: list[str], classes: list[str],
                  epochs: int = 80, lr: float = 0.3,
                  l2: float = 1e-4, seed: int = 42,
                  ) -> tuple[dict[str, dict[str, float]], dict[str, float]]:
    """Deterministic multinomial (softmax) logistic regression over sparse
    string-count features — the multiclass analogue of ``train_logreg``
    for the sense-classifier slot (``ml/PDTBNewConnectiveSenseTrainer``
    trains a Mallet MaxEnt, which IS multinomial logistic regression;
    Mallet ``MaxEntTrainer`` docs).  Training is offline and corpus-small
    (SURVEY.md §3.2), so plain per-example SGD with a seeded shuffle is
    enough.  Duplicate features count with multiplicity, matching Mallet's
    additive ``FeatureVector`` construction.

    Returns ``(weights, biases)`` with ``weights[cls][feat]`` /
    ``biases[cls]``."""
    import random
    rng = random.Random(seed)
    classes = sorted(classes)
    weights: dict[str, dict[str, float]] = {c: {} for c in classes}
    biases: dict[str, float] = {c: 0.0 for c in classes}
    idx = list(range(len(x)))
    for _ in range(epochs):
        rng.shuffle(idx)
        for i in idx:
            counts: dict[str, int] = {}
            for f in x[i]:
                counts[f] = counts.get(f, 0) + 1
            logits = []
            for c in classes:
                wc = weights[c]
                s = biases[c]
                for f, n in counts.items():
                    w = wc.get(f)
                    if w is not None:
                        s += w * n
                logits.append(s)
            m = max(logits)
            exps = [math.exp(s - m) for s in logits]
            z = sum(exps)
            for c, e in zip(classes, exps):
                g = e / z - (1.0 if c == y[i] else 0.0)
                biases[c] -= lr * g
                wc = weights[c]
                for f, n in counts.items():
                    wc[f] = wc.get(f, 0.0) * (1 - lr * l2) - lr * g * n
    return weights, biases


def quantize_softmax(weights: dict[str, dict[str, float]],
                     biases: dict[str, float], scale: int = 1_000_000,
                     ) -> tuple[dict[str, dict[str, int]], dict[str, int]]:
    """Integer-quantize a softmax model (same committed-model trick as the
    CRF: integer scores make the cross-engine argmax exact — no float
    formatting or summation-order divergence between Spark workers and the
    DuckDB oracle).  Zero quantized weights are dropped."""
    wq = {c: {f: int(round(w * scale)) for f, w in wc.items()
              if int(round(w * scale)) != 0}
          for c, wc in weights.items()}
    bq = {c: int(round(b * scale)) for c, b in biases.items()}
    return wq, bq


def score_softmax_int(features: list[str],
                      weights: dict[str, dict[str, int]],
                      biases: dict[str, int],
                      classes: list[str]) -> tuple[str, int]:
    """Argmax class + its integer score.  ``classes`` must be sorted;
    strict ``>`` keeps the first (lexicographically smallest) class on
    ties — mirrored by the oracle's ``min(cls)`` over the max score.
    Duplicate features add with multiplicity."""
    best_c = classes[0]
    best_s = None
    for c in classes:
        wc = weights.get(c, {})
        s = biases.get(c, 0)
        for f in features:
            s += wc.get(f, 0)
        if best_s is None or s > best_s:
            best_c, best_s = c, s
    return best_c, best_s


def save_model(path: str, weights: dict[str, float], bias: float) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"bias": bias, "weights": weights}, f, sort_keys=True)


def load_model(path: str) -> tuple[dict[str, float], float]:
    with open(path) as f:
        m = json.load(f)
    return m["weights"], m["bias"]


DEFAULT_MODEL_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                                  "models", "ppi_maxent.json")
