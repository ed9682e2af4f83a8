#!/usr/bin/env python
"""Offline MaxEnt training for the AIMed feature pipe (MERelexAIMed slot).

``relx/MERelexAIMed.java:396-430`` trains a Mallet MaxEnt over
``RelexPipeAIMed`` features on AIMed gold pairs; here the same shape runs
on the seeded gold fixtures (single-process — AIMed-scale corpora are
thousands of pairs; SURVEY.md §3.2). The persisted JSON weight map is the
runtime model, broadcast by ``operators/ml.extract_triples_aimed``.
Deterministic (seed=42).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from nlp_lib_spark.fixtures import FIXTURE_CONFIG, generate_transcripts
from nlp_lib_spark.kernels.aimed import aimed_features
from nlp_lib_spark.kernels.constit import build_tree
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.scoring import save_model, score, train_logreg
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.kernels.tree import parse_penn

AIMED_MODEL_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                                "nlp_lib_spark", "models", "aimed_me.json")


def aimed_candidates(rt, sentence: str):
    """(ann, i, j, feats) per PROTEIN pair, featurized by the AIMed pipe."""
    ann = annotate_sentence(rt, sentence)
    if (ann is None or ann["entity_count"] <= 1
            or ann["entity_count"] > rt.max_mentions):
        return
    blinded = ann["blinded"]
    g = DepGraph(ann["edges"])
    tree = parse_penn(build_tree(blinded, ann["pos"]))
    prot = [i for i, t in enumerate(blinded) if "PROTEIN" in t]
    for a in range(len(prot)):
        for b in range(a + 1, len(prot)):
            i, j = prot[a], prot[b]
            yield ann, i, j, aimed_features(blinded, ann["pos"], g, tree,
                                            i, j)


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
            for ann, i, j, feats in aimed_candidates(rt, sentence):
                m = ann["mapping"]
                subj = m.get(ann["blinded"][i], ann["blinded"][i]).lower()
                obj = m.get(ann["blinded"][j], ann["blinded"][j]).lower()
                xs.append(feats)
                ys.append(1 if (subj, obj) in gset else 0)
    return xs, ys


def main() -> None:
    xs, ys = build_dataset()
    n_pos = sum(ys)
    print(f"pairs={len(xs)} pos={n_pos} neg={len(ys) - n_pos}")
    weights, bias = train_logreg(xs, ys)
    tp = fp = fn = 0
    for f, y in zip(xs, ys):
        pred = 1 if score(f, weights, bias) > 0.5 else 0
        tp += pred and y
        fp += pred and not y
        fn += (not pred) and y
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    print(f"train P={prec:.4f} R={rec:.4f} features={len(weights)}")
    out = os.path.abspath(AIMED_MODEL_PATH)
    save_model(out, weights, bias)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
