#!/usr/bin/env python
"""Offline training for the discourse-marker sequence tagger.

Trains the averaged structured perceptron (kernels/crf.py) to reproduce
connective B/I/O tagging over the sf0.001 transcript sentences, with gold
labels from the frozen connective lexicon — the trained counterpart of
DiscourseMarkerAnnotator's CRF (the reference trains Mallet CRFs offline
the same way, ml/crf/CRFTrainer.java).

Weights are QUANTIZED to integers (x 1e6) before saving: integer weights
make every Viterbi score an exact BIGINT sum, so the distributed decode
and the DuckDB gate oracle are bit-identical by construction (the same
discipline as the MaxEnt basis-point scores).

Usage: python scripts/train_crf.py [sf_dir] [out_json]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import duckdb

from nlp_lib_spark.kernels.crf import train_perceptron, viterbi, tagset_of
from nlp_lib_spark.kernels.discourse import ConnectiveLexicon
from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.lexicons import TESTDATA_CONFIG
from nlp_lib_spark.operators.transcripts import transcripts_select_sql

from nlp_lib_spark.kernels.crf import \
    DEFAULT_CRF_MODEL_PATH as DEFAULT_OUT  # noqa: E402


def build_corpus(sf_dir: str):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    rows = con.execute(
        transcripts_select_sql("documents", "duckdb", with_ts=False)
    ).fetchall()
    rt = TESTDATA_CONFIG.build()
    lex = ConnectiveLexicon()
    x, y = [], []
    for _conv, _ti, _role, text, _tool in rows:
        if not text:
            continue
        for sentence in split_sentences(strip_citations(text)):
            ann = annotate_sentence(rt, sentence, full=True)
            if ann is None:
                continue
            toks = ann["blinded"]
            pos = ann["pos"] or [""] * len(toks)
            tags = ["O"] * len(toks)
            for (a, b) in lex.find(toks):
                tags[a] = "B-DIS_CON"
                for k in range(a + 1, b + 1):
                    tags[k] = "I-DIS_CON"
            x.append((toks, pos))
            y.append(tags)
    return x, y


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    x, y = build_corpus(sf_dir)
    w = train_perceptron(x, y)
    wq = {k: float(round(v * 1_000_000)) for k, v in w.items()}
    wq = {k: v for k, v in wq.items() if v != 0.0}
    tags = tagset_of(wq)
    n_tok = n_ok = 0
    for (toks, pos), gold in zip(x, y):
        pred = viterbi(toks, pos, tags, wq)
        n_tok += len(gold)
        n_ok += sum(1 for a, b in zip(pred, gold) if a == b)
    print(f"sentences={len(x)} tags={tags} weights={len(wq)} "
          f"train-acc={n_ok / n_tok:.4f}")
    with open(out, "w") as f:
        json.dump({"weights": wq}, f, sort_keys=True)
    print("saved", out)


if __name__ == "__main__":
    main()
