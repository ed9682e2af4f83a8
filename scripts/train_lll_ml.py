#!/usr/bin/env python
"""Offline MaxEnt training for the LLL ML path (relx/MERelex.train,
java:41-62): all LEXE-B candidate pairs over the seeded gold fixtures,
RelexPipe features, logistic regression, JSON weight export.

Gold signatures are undirected pair-surface matches (MERelex's
"don't bother about direction" branch, java:82-87). Deterministic
(seed=42); the persisted weight map is broadcast by
operators/lll.extract_triples_lll_ml.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from nlp_lib_spark.fixtures import (FIXTURE_DOMAIN, FIXTURE_ENTITIES,
                                    generate_transcripts)
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.lll_relex import lex_chunk, resolve_surface
from nlp_lib_spark.kernels.relex_pipe import relex_features
from nlp_lib_spark.kernels.scoring import save_model, score, train_logreg
from nlp_lib_spark.lexicons import TESTDATA_LLL_RESTRICTION
from nlp_lib_spark.operators.lll import LLLConfig

LLL_ML_MODEL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 os.pardir, "nlp_lib_spark", "models",
                                 "lll_me.json")

FIXTURE_LLL_CONFIG = LLLConfig(lexicon_lines=FIXTURE_ENTITIES,
                               restriction_terms=TESTDATA_LLL_RESTRICTION,
                               domain_terms=FIXTURE_DOMAIN)


def build_dataset(n_convs: int = 120, seed: int = 42):
    from nlp_lib_spark.kernels.bio import chunk_bio
    from nlp_lib_spark.kernels.depparse import dep_parse
    from nlp_lib_spark.kernels.postag import pos_tag
    from nlp_lib_spark.kernels.text import (split_sentences, strip_citations,
                                            tokenize)
    turns, gold = generate_transcripts(n_convs=n_convs, seed=seed)
    gold_by_sent: dict[tuple, set[frozenset]] = {}
    for (c, t, s, subj, _pred, obj) in gold:
        gold_by_sent.setdefault((c, t, s), set()).add(
            frozenset((subj, obj)))
    rt = FIXTURE_LLL_CONFIG.build()
    xs, ys = [], []
    for (c, t, _role, text, _tool, _ts) in turns:
        cleaned = strip_citations(text)
        for sid, sentence in enumerate(split_sentences(cleaned)):
            tokens = tokenize(sentence)
            if not tokens or len(tokens) > rt.max_sent_tokens:
                continue
            lexe = rt.lexicon.annotate(tokens)
            bs = [i for i in range(len(tokens)) if lexe[i] == "B"]
            if len(bs) < 2:
                continue
            pos = pos_tag(tokens, rt.verb_stems)
            g = DepGraph(dep_parse(tokens, pos))
            gset = gold_by_sent.get((c, t, sid), set())
            for a_i, i in enumerate(bs):
                for j in bs[a_i + 1:]:
                    si = lex_chunk(tokens, lexe, i)
                    sj = lex_chunk(tokens, lexe, j)
                    if si is None or sj is None:
                        continue
                    sig = frozenset((resolve_surface(si, rt.lexicon).lower(),
                                     resolve_surface(sj, rt.lexicon).lower()))
                    xs.append(relex_features(tokens, g, i, j))
                    ys.append(1 if sig in gset else 0)
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
    p = tp / max(1, tp + fp)
    r = tp / max(1, tp + fn)
    print(f"train P={p:.4f} R={r:.4f}")
    save_model(LLL_ML_MODEL_PATH, weights, bias)
    print("saved:", LLL_ML_MODEL_PATH)


if __name__ == "__main__":
    main()
