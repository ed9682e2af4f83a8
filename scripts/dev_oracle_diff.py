"""Dev harness: diff the DuckDB rule-chain oracle SQL against the pure-Python
kernels, per sentence, at a given sf dir.

Usage: python3 scripts/dev_oracle_diff.py [sf_dir] [what]
  what in {deps, r1, r2, r2b, r3, union, triples} (default: deps)
"""
from __future__ import annotations

import os
import sys
from collections import defaultdict

import duckdb

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir))

from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.rules import (Sent, predict_interactions, rule1,
                                         rule2, rule2b, rule3)
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.lexicons import TESTDATA_CONFIG
from nlp_lib_spark.operators.transcripts import transcripts_select_sql
from nlp_lib_spark import oracles

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
what = sys.argv[2] if len(sys.argv) > 2 else "deps"

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
rows = con.execute(transcripts_select_sql("documents", "duckdb", with_ts=False)
                   ).fetchall()

# ---- Python ground truth ----
rt = TESTDATA_CONFIG.build()
py: dict[tuple, set] = defaultdict(set)
sent_text: dict[tuple, list[str]] = {}
for conv_id, turn_idx, role, text, tool in rows:
    if not text:
        continue
    for sid, sentence in enumerate(split_sentences(strip_citations(text))):
        ann = annotate_sentence(rt, sentence)
        if ann is None or not (
                2 <= ann["entity_count"] <= TESTDATA_CONFIG.max_mentions):
            continue
        key = (conv_id, turn_idx, sid)
        sent_text[key] = ann["blinded"]
        s = Sent(ann["blinded"], ann["pos"], ann["domain"])
        g = DepGraph(ann["edges"])
        if what == "deps":
            py[key] = set(ann["edges"])
        elif what == "r1":
            py[key] = rule1(s, g)
        elif what == "r2":
            py[key] = rule2(s, g)
        elif what == "r2b":
            py[key] = rule2b(s, g)
        elif what == "r3":
            py[key] = rule3(s, g)
        elif what == "union":
            py[key] = predict_interactions(ann["blinded"], ann["pos"],
                                           ann["domain"], ann["edges"])
        elif what == "triples":
            from nlp_lib_spark.kernels.pipeline import triples_for_sentence
            for (i, j, subj, pred, obj) in triples_for_sentence(rt, sentence):
                py[key].add((i, j, subj, pred, obj))
        elif what == "kern":
            from nlp_lib_spark.kernels.pipeline import resolve_surface
            from nlp_lib_spark.kernels.kernelscore import prototype_score
            from nlp_lib_spark.operators.kernel_score import (
                build_prototypes, instances_for_sentence)
            global _KPROTOS
            try:
                _KPROTOS
            except NameError:
                _KPROTOS = build_prototypes(TESTDATA_CONFIG, [
                    "the spark activates the table.",
                    "a vector binds the stream.",
                    "the column regulates a row.",
                ])
            for ann2, g2, inst in instances_for_sentence(rt, sentence):
                sc = prototype_score(inst, _KPROTOS, "lcs")
                if sc < 0.5:
                    continue
                i, j = inst["e1"], inst["e2"]
                if i == j:
                    continue
                m = ann2["mapping"]
                py[key].add((i, j, resolve_surface(m, ann2["blinded"][i]),
                             "interacts_with",
                             resolve_surface(m, ann2["blinded"][j]),
                             inst["type"],
                             int(round(round(sc, 6) * 1000000))))
        elif what == "rc":
            from nlp_lib_spark.kernels.rules import rel_candidates
            py[key] = rel_candidates(ann["blinded"], ann["pos"],
                                     ann["domain"], ann["edges"])
        elif what == "ml":
            from nlp_lib_spark.kernels.pipeline import _pred_term, resolve_surface
            from nlp_lib_spark.kernels.scoring import (DEFAULT_MODEL_PATH,
                                                       load_model, score)
            from nlp_lib_spark.operators.ml import candidate_pairs_for_sentence
            global _ML_W
            try:
                _ML_W
            except NameError:
                _ML_W = load_model(DEFAULT_MODEL_PATH)
            weights, bias = _ML_W
            for ann2, i, j, feats in candidate_pairs_for_sentence(rt, sentence):
                pr = score(feats, weights, bias)
                if pr <= 0.5:
                    continue
                m = ann2["mapping"]
                if i == j:
                    continue
                subj = resolve_surface(m, ann2["blinded"][i])
                obj = resolve_surface(m, ann2["blinded"][j])
                pred = _pred_term(ann2["domain"], i, j)
                py[key].add((i, j, subj, pred, obj,
                             int(round(round(pr, 4) * 10000))))

# ---- SQL side ----
if what == "deps":
    sql = oracles.dep_edges_oracle_sql()
elif what == "r1":
    sql = oracles.rule1_pairs_oracle_sql()
elif what == "r2":
    sql = oracles.rule2_pairs_oracle_sql()
elif what == "r2b":
    sql = oracles.rules_sql_prefix() + oracles._pairs_select("r2b_pairs")
elif what == "r3":
    sql = oracles.rule3_pairs_oracle_sql()
elif what == "union":
    sql = oracles.union_pairs_oracle_sql()
elif what == "triples":
    sql = oracles.triples_oracle_sql()
elif what == "ml":
    sql = oracles.ml_triples_oracle_sql()
elif what == "rc":
    sql = oracles.rel_candidates_oracle_sql()
elif what == "kern":
    sql = oracles.kernel_triples_oracle_sql()

sq: dict[tuple, set] = defaultdict(set)
for row in con.execute(sql).fetchall():
    key = (row[0], row[1], row[2])
    sq[key].add(tuple(row[3:]))

# ---- diff ----
nbad = 0
allkeys = set(py) | set(sq)
for key in sorted(allkeys):
    p, s = py.get(key, set()), sq.get(key, set())
    if p != s:
        nbad += 1
        if nbad <= 8:
            print(f"DIFF {key}: tokens={sent_text.get(key)}")
            print(f"  py-only:  {sorted(p - s)}")
            print(f"  sql-only: {sorted(s - p)}")
ntotal = len(allkeys)
npy = sum(len(v) for v in py.values())
nsq = sum(len(v) for v in sq.values())
print(f"[{what}] sentences={ntotal} mismatched={nbad} py_items={npy} sql_items={nsq}")
sys.exit(1 if nbad else 0)
