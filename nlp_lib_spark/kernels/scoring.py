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
