"""Fuzz the rule-chain SQL oracles beyond the driver corpus.

Synthesizes a documents parquet whose template slots carry an adversarial
vocabulary (verb morphology, auxiliaries, modals, conjunctions, numerals,
punctuation-ish tokens) so the dep-parse and rule SQL replicas exercise
branches the fixed testdata never reaches (num/det edges, conj_or, MD verb
groups, passive aux chains, advmod attachment). Then diffs DuckDB oracle
output against the Python kernels exactly like dev_oracle_diff.py.

Usage: python3 scripts/dev_oracle_fuzz.py [n_docs] [seed] [what...]
"""
from __future__ import annotations

import random
import os
import sys
import tempfile
from collections import defaultdict

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir))

from nlp_lib_spark import oracles
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.rules import Sent, predict_interactions
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.lexicons import TESTDATA_CONFIG
from nlp_lib_spark.operators.transcripts import transcripts_select_sql

# slot words chosen to stress POS/dep branches: gerunds/participles (VBG/VBN
# paths), auxiliaries and modals (verb-group state machine), numbers (num
# edges + CD runs), conjunctions (conj_or + CC distribution), adverbs
# (advmod + prep-gov RB skip), entity vocabulary (mention machinery)
ADVERSARIAL = [
    "spark", "table", "row", "vector", "binding", "regulated", "activating",
    "was", "been", "will", "may", "42", "7", "or", "and", "not", "never",
    "strongly", "very", "big", "novel", "interaction", "merge", "scan",
    "hash", "window", "key", "batch", "value", "therefore", "however",
    "results", "showed", "observed", "suggests", "inhibits", "customer",
]


def make_docs(n: int, seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # 14 words: the transcripts derivation reads positions 3, 5, 9, 12
        words = [rng.choice(ADVERSARIAL) for _ in range(14)]
        rows.append((i, " ".join(words)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    whats = sys.argv[3:] or ["deps", "union", "triples", "lll", "lll_ml", "relx"]
    return run_fuzz(n_docs, seed, whats)


def run_fuzz(n_docs: int, seed: int, whats: list[str]) -> int:
    """Programmatic entry (pytest guards a small configuration of this)."""
    with tempfile.TemporaryDirectory() as td:
        pq = f"{td}/documents.parquet"
        con = duckdb.connect()
        con.register("docs_df", make_docs(n_docs, seed))
        con.execute(f"COPY docs_df TO '{pq}' (FORMAT PARQUET)")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
        rows = con.execute(
            transcripts_select_sql("documents", "duckdb", with_ts=False)
        ).fetchall()

        rt = TESTDATA_CONFIG.build()
        failures = 0
        for what in whats:
            if what in ("lll", "lll_ml", "relx"):
                failures += _check_lll(con, rows, what)
                continue
            py: dict[tuple, set] = defaultdict(set)
            for conv_id, turn_idx, _role, text, _tool in rows:
                if not text:
                    continue
                for sid, sentence in enumerate(
                        split_sentences(strip_citations(text))):
                    ann = annotate_sentence(rt, sentence)
                    if ann is None or not (
                            2 <= ann["entity_count"]
                            <= TESTDATA_CONFIG.max_mentions):
                        continue
                    key = (conv_id, turn_idx, sid)
                    if what == "deps":
                        py[key] = set(ann["edges"])
                    elif what == "union":
                        py[key] = predict_interactions(
                            ann["blinded"], ann["pos"], ann["domain"],
                            ann["edges"])
                    elif what == "triples":
                        from nlp_lib_spark.kernels.pipeline import \
                            triples_for_sentence
                        for row in triples_for_sentence(rt, sentence):
                            py[key].add(row)

            sql = {"deps": oracles.dep_edges_oracle_sql,
                   "union": oracles.union_pairs_oracle_sql,
                   "triples": oracles.triples_oracle_sql}[what]()
            sq: dict[tuple, set] = defaultdict(set)
            for row in con.execute(sql).fetchall():
                sq[(row[0], row[1], row[2])].add(tuple(row[3:]))
            bad = [k for k in set(py) | set(sq) if py.get(k, set()) != sq.get(k, set())]
            npy = sum(len(v) for v in py.values())
            print(f"[{what}] sentences={len(set(py) | set(sq))} "
                  f"mismatched={len(bad)} items={npy}")
            for k in bad[:5]:
                print("  DIFF", k,
                      "py-only", sorted(py.get(k, set()) - sq.get(k, set()))[:4],
                      "sql-only", sorted(sq.get(k, set()) - py.get(k, set()))[:4])
            failures += len(bad)
        return 1 if failures else 0


def _check_lll(con, rows, what: str) -> int:
    """Fuzz the legacy-LLL oracles (rule union / MERelex scoring): the
    canonical-equivalence assumptions documented in
    oracles.lll_triples_oracle_sql are corpus-dependent, so adversarial
    vocabulary is exactly where they would break first."""
    from nlp_lib_spark.gate import lll_config
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.depparse import dep_parse
    from nlp_lib_spark.kernels.lll_relex import lex_chunk, resolve_surface
    from nlp_lib_spark.kernels.postag import pos_tag
    from nlp_lib_spark.kernels.relex_pipe import relex_features
    from nlp_lib_spark.kernels.scoring import load_model, score
    from nlp_lib_spark.kernels.text import tokenize
    from nlp_lib_spark.operators.lll import (DEFAULT_LLL_ML_MODEL_PATH,
                                             lll_turn)

    from nlp_lib_spark.kernels.relex_pipe import extended_relex_interactions
    from nlp_lib_spark.kernels.relx_rules import XSent
    from nlp_lib_spark.operators.lll import _relx_surface

    cfg = lll_config()
    rt = cfg.build()
    weights, bias = load_model(DEFAULT_LLL_ML_MODEL_PATH)
    py: dict[tuple, set] = defaultdict(set)
    for conv_id, turn_idx, _role, text, _tool in rows:
        if not text:
            continue
        if what == "relx":
            for sid, sentence in enumerate(
                    split_sentences(strip_citations(text))):
                tokens = tokenize(sentence)
                if not tokens or len(tokens) > rt.max_sent_tokens:
                    continue
                lexe = rt.lexicon.annotate(tokens)
                pos = pos_tag(tokens, rt.verb_stems)
                g = DepGraph(dep_parse(tokens, pos))
                s = XSent(tokens, pos, lexe)
                for (a, t) in extended_relex_interactions(
                        s, g, rt.restriction):
                    sa = lex_chunk(tokens, lexe, a)
                    st = lex_chunk(tokens, lexe, t)
                    if sa is None or st is None:
                        continue
                    py[(conv_id, turn_idx, sid)].add(
                        (a, t, _relx_surface(sa, rt.lexicon),
                         "genic_interaction", _relx_surface(st, rt.lexicon)))
        elif what == "lll":
            for (sid, a, t, subj, pred, obj) in lll_turn(rt, text):
                py[(conv_id, turn_idx, sid)].add((a, t, subj, pred, obj))
        else:
            for sid, sentence in enumerate(
                    split_sentences(strip_citations(text))):
                tokens = tokenize(sentence)
                if not tokens or len(tokens) > rt.max_sent_tokens:
                    continue
                lexe = rt.lexicon.annotate(tokens)
                bs = [i for i, tg in enumerate(lexe) if tg == "B"]
                if len(bs) < 2:
                    continue
                pos = pos_tag(tokens, rt.verb_stems)
                g = DepGraph(dep_parse(tokens, pos))
                for ai, i in enumerate(bs):
                    for j in bs[ai + 1:]:
                        p = score(relex_features(tokens, g, i, j),
                                  weights, bias)
                        if p <= 0.5:
                            continue
                        si = lex_chunk(tokens, lexe, i)
                        sj = lex_chunk(tokens, lexe, j)
                        if si is None or sj is None:
                            continue
                        py[(conv_id, turn_idx, sid)].add(
                            (i, j, resolve_surface(si, rt.lexicon),
                             "genic_interaction",
                             resolve_surface(sj, rt.lexicon),
                             round(p * 10000)))
    sql = {"lll": oracles.lll_triples_oracle_sql,
           "lll_ml": oracles.lll_ml_triples_oracle_sql,
           "relx": oracles.relx_triples_oracle_sql}[what]()
    sq: dict[tuple, set] = defaultdict(set)
    for row in con.execute(sql).fetchall():
        sq[(row[0], row[1], row[2])].add(tuple(row[3:]))
    bad = [k for k in set(py) | set(sq)
           if py.get(k, set()) != sq.get(k, set())]
    npy = sum(len(v) for v in py.values())
    print(f"[{what}] sentences={len(set(py) | set(sq))} "
          f"mismatched={len(bad)} items={npy}")
    for k in bad[:5]:
        print("  DIFF", k,
              "py-only", sorted(py.get(k, set()) - sq.get(k, set()))[:3],
              "sql-only", sorted(sq.get(k, set()) - py.get(k, set()))[:3])
    return len(bad)


if __name__ == "__main__":
    sys.exit(main())
