#!/usr/bin/env python
"""Offline multiclass MaxEnt training for the connective-sense classifier.

``ml/PDTBNewConnectiveSenseTrainer.java:96-150`` trains a Mallet MaxEnt
over ``PDTBConnectiveSense2FeatureVector`` features, one instance per
gold-annotated connective, label = the PDTB sense.  This sandbox has no
PDTB, so — like every other trainer here — seeded synthetic corpora stand
in: the testdata documents (the distribution the driver gate sees) plus
``fixtures.generate_discourse_turns`` (which plants every lexicon
connective, including the ambiguous ones in both contexts), with a
deterministic context-dependent annotation rule standing in for the human
sense labels: connectives in ``AMBIG`` take their alternate sense when
the chunk right of the connective is a verb group (readable off the
``CONN&NEXT-CHUNK=V`` feature the pipe already emits), otherwise the
lexicon sense.  That makes the task genuinely contextual — the ``CAT=``
lexicon-prior feature alone cannot solve it — while remaining exactly
learnable, mirroring the reference's P/R bar.

The trained softmax is integer-quantized (the committed-CRF trick) so the
runtime argmax and the DuckDB oracle agree bit-for-bit, and persisted to
``nlp_lib_spark/models/sense_me.json``.  Deterministic (seed=42).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import duckdb

from nlp_lib_spark.kernels.connfeatures import sense_features
from nlp_lib_spark.kernels.constit import build_tree
from nlp_lib_spark.kernels.discourse import ConnectiveLexicon, arg2_head
from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.scoring import (quantize_softmax,
                                           score_softmax_int,
                                           train_softmax)
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.kernels.tree import parse_penn
from nlp_lib_spark.lexicons import TESTDATA_CONFIG
from nlp_lib_spark.operators.transcripts import transcripts_select_sql

SENSE_MODEL_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                                "nlp_lib_spark", "models", "sense_me.json")

# Connective -> alternate sense taken when the chunk right of the
# connective is a verb group (readable off the CONN&NEXT-CHUNK=V feature
# the pipe already emits).  The stand-in for PDTB's genuinely ambiguous
# connectives: "since" temporal-vs-causal, "when" conditional-vs-temporal,
# etc. — the lexicon prior (CAT=) alone cannot solve these.
AMBIG: dict[str, str] = {
    "since": "Temporal",
    "when": "Contingency",
    "but": "Expansion",
    "then": "Contingency",
}


def gold_sense(conn_phrase: str, lex_sense: str, feats: list[str]) -> str:
    alt = AMBIG.get(conn_phrase)
    if alt is not None and "CONN&NEXT-CHUNK=V" in feats:
        return alt
    return lex_sense


def load_turns(sf_dir: str) -> list[str]:
    """Turn texts via the same dual-dialect transcripts derivation the
    runtime uses (train_crf.py does the identical read)."""
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    rows = con.execute(
        transcripts_select_sql("documents", "duckdb", with_ts=False)
    ).fetchall()
    return [r[3] for r in rows if r[3]]


def iter_instances(texts):
    """(conn_phrase, feats, gold) per connective, mirroring the exact
    runtime stream of operators/discourse.sense_feature_rows."""
    rt = TESTDATA_CONFIG.build()
    lex = ConnectiveLexicon()
    for text in texts:
        cleaned = strip_citations(text)
        for sentence in split_sentences(cleaned):
            ann = annotate_sentence(rt, sentence, full=True)
            if ann is None:
                continue
            toks = ann["blinded"]
            pos = ann["pos"]
            if not toks or len(pos) != len(toks):
                continue
            spans = lex.find(toks)
            if not spans:
                continue
            tree = parse_penn(build_tree(toks, pos))
            for span in spans:
                a2h = arg2_head(toks, pos, span)
                if a2h < 0:
                    continue
                phrase = " ".join(t.lower()
                                  for t in toks[span[0]:span[1] + 1])
                lex_sense = lex.sense(toks, span)
                feats = sense_features(toks, pos, tree, span[0], span[1],
                                       a2h, lex_sense)
                yield phrase, feats, gold_sense(phrase, lex_sense, feats)


def main() -> int:
    from nlp_lib_spark.fixtures import generate_discourse_turns
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    texts = load_turns(sf_dir)
    # deterministic 80/20 split (sentence-level corpora are i.i.d. here),
    # each side augmented with a DISJOINT-seed discourse-rich sample
    cut = len(texts) * 4 // 5
    train_texts = texts[:cut] + generate_discourse_turns(600, seed=42)
    test_texts = texts[cut:] + generate_discourse_turns(200, seed=4242)
    xs, ys = [], []
    for _phrase, feats, gold in iter_instances(train_texts):
        xs.append(feats)
        ys.append(gold)
    classes = sorted(set(ys))
    print(f"train instances: {len(xs)}  classes: {classes}")
    weights, biases = train_softmax(xs, ys, classes, epochs=80, lr=0.3,
                                    l2=1e-4, seed=42)
    wq, bq = quantize_softmax(weights, biases)

    # Quantization must not flip any training prediction, and the
    # integer argmax margin must be reported (cross-engine safety).
    n_ok = 0
    min_gap = None
    for feats, gold in zip(xs, ys):
        pred, best = score_softmax_int(feats, wq, bq, classes)
        scores = sorted(
            (bq[c] + sum(wq[c].get(f, 0) for f in feats) for c in classes),
            reverse=True)
        gap = scores[0] - scores[1]
        min_gap = gap if min_gap is None else min(min_gap, gap)
        n_ok += pred == gold
    train_acc = n_ok / max(1, len(xs))

    held = [(f, g) for _p, f, g in iter_instances(test_texts)]
    n_ok = sum(score_softmax_int(f, wq, bq, classes)[0] == g
               for f, g in held)
    test_acc = n_ok / max(1, len(held))
    print(f"train acc {train_acc:.4f}  held-out acc {test_acc:.4f} "
          f"({len(held)} instances)  min integer argmax gap {min_gap}")
    assert train_acc >= 0.97 and test_acc >= 0.95, "sense model below bar"
    assert min_gap is not None and min_gap > 0, "quantized argmax tie"

    import json
    os.makedirs(os.path.dirname(SENSE_MODEL_PATH), exist_ok=True)
    with open(SENSE_MODEL_PATH, "w") as f:
        json.dump({"classes": classes, "scale": 1_000_000,
                   "biases": bq, "weights": wq}, f, sort_keys=True)
    n_w = sum(len(wc) for wc in wq.values())
    print(f"saved {SENSE_MODEL_PATH} ({n_w} integer weights)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
