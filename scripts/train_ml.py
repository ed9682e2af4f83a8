#!/usr/bin/env python
"""Offline MaxEnt training on the seeded gold fixtures (SURVEY.md §3.2).

Single-process: PPI training corpora are small (thousands of pairs). The
persisted JSON weight map is the runtime model, broadcast by
operators/ml.extract_triples_ml. Deterministic (seed=42).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from nlp_lib_spark.fixtures import FIXTURE_CONFIG, generate_transcripts
from nlp_lib_spark.kernels.scoring import (DEFAULT_MODEL_PATH,
                                           prune_by_info_gain, save_model,
                                           score, train_logreg)
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.operators.ml import candidate_pairs_for_sentence


def build_dataset(n_convs: int = 120, seed: int = 42):
    turns, gold = generate_transcripts(n_convs=n_convs, seed=seed)
    gold_by_sent: dict[tuple, set[tuple[str, str]]] = {}
    for (c, t, s, subj, pred, obj) in gold:
        gold_by_sent.setdefault((c, t, s), set()).add((subj, obj))
    rt = FIXTURE_CONFIG.build()
    xs, ys = [], []
    for (c, t, _role, text, _tool, _ts) in turns:
        cleaned = strip_citations(text)
        for sid, sentence in enumerate(split_sentences(cleaned)):
            gset = gold_by_sent.get((c, t, sid), set())
            for ann, i, j, feats in candidate_pairs_for_sentence(rt, sentence):
                m = ann["mapping"]
                if i == j:
                    parts = ann["blinded"][i].split("/")
                    subj = m.get(parts[0], parts[0]).lower()
                    obj = m.get(parts[-1], parts[-1]).lower()
                else:
                    subj = m.get(ann["blinded"][i], ann["blinded"][i]).lower()
                    obj = m.get(ann["blinded"][j], ann["blinded"][j]).lower()
                xs.append(feats)
                ys.append(1 if (subj, obj) in gset else 0)
    return xs, ys


def main() -> None:
    xs, ys = build_dataset()
    n_pos = sum(ys)
    print(f"pairs={len(xs)} pos={n_pos} neg={len(ys) - n_pos}")
    # shipped-model export prunes to the top-1500 features by InfoGain
    # (MLExtractor.java:182 / PruneFeatureVectors.pruneByInfoGain)
    xs = prune_by_info_gain(xs, ys, k=1500)
    weights, bias = train_logreg(xs, ys)
    # training accuracy report
    tp = fp = fn = 0
    for f, y in zip(xs, ys):
        pred = 1 if score(f, weights, bias) > 0.5 else 0
        tp += pred and y
        fp += pred and not y
        fn += (not pred) and y
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    print(f"train P={prec:.4f} R={rec:.4f} features={len(weights)}")
    out = os.path.abspath(DEFAULT_MODEL_PATH)
    save_model(out, weights, bias)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
