"""Corpus readers round-trip + RunRelex-style rule evaluation."""

from __future__ import annotations

import pytest

from nlp_lib_spark.fixtures import (FIXTURE_CONFIG, FIXTURE_DOMAIN,
                                    generate_transcripts)
from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.operators.evaluate import rule_eval, write_ppi_corpus
from nlp_lib_spark.sources.readers import (gold_pairs, parse_dep,
                                           read_deps, read_iob_corpus,
                                           read_trees)


def test_parse_dep_format():
    assert parse_dep("nsubj(interacts-3, hash-2)") == ("nsubj", 2, 1)
    assert parse_dep("prep_with(binds-2, p53-5')") == ("prep_with", 1, 4)
    assert parse_dep("garbage") is None


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Synthesize a PPI-corpus-shaped fixture from the generator gold."""
    out = str(tmp_path_factory.mktemp("ppi_corpus"))
    turns, gold = generate_transcripts(n_convs=25, seed=21)
    gold_by_sent = {}
    for (c, t, s, subj, pred, obj) in gold:
        gold_by_sent.setdefault((c, t, s), []).append((subj, obj))
    rt = FIXTURE_CONFIG.build()
    rows = []
    pair_seq = 0
    for (c, t, _role, text, _tool, _ts) in turns:
        doc_id = f"{c}_{t}"
        for sid, sentence in enumerate(split_sentences(strip_citations(text))):
            ann = annotate_sentence(rt, sentence, full=True)
            if ann is None:  # oversize straggler guard
                continue
            toks = ann["blinded"]
            n = len(toks)
            p1, p2 = ["O"] * n, ["O"] * n
            inv = {}
            for k, tok in enumerate(toks):
                for pid in tok.split("/"):
                    if pid in ann["mapping"]:
                        inv.setdefault(ann["mapping"][pid].lower(), k)
            for (subj, obj) in gold_by_sent.get((c, t, sid), []):
                i = inv.get(subj)
                j = inv.get(obj)
                if i is None or j is None:
                    continue
                pid = f"pr{pair_seq}"
                pair_seq += 1
                p1[i] = pid if p1[i] == "O" else p1[i] + ", " + pid
                p2[j] = pid if p2[j] == "O" else p2[j] + ", " + pid
            rows.append({
                "doc_id": doc_id, "sent_id": sid, "tokens": toks,
                "p1": p1, "p2": p2, "n1": ["O"] * n, "n2": ["O"] * n,
                "edges": ann["edges"] or [],
            })
    write_ppi_corpus(rows, out)
    return out


def test_corpus_round_trip(spark, corpus_dir):
    iob = read_iob_corpus(spark, f"{corpus_dir}/iob")
    deps = read_deps(spark, f"{corpus_dir}/depsCC")
    trees = read_trees(spark, f"{corpus_dir}/trees")
    assert iob.count() == deps.count() == trees.count() > 0
    g = gold_pairs(iob)
    assert g.filter("label = 1").count() > 0
    # a doc's tokens survive the round trip
    row = iob.orderBy("doc_id", "sent_id").first()
    assert row.tokens and all(isinstance(t, str) for t in row.tokens)


def test_rule_eval_on_corpus(spark, corpus_dir):
    iob = read_iob_corpus(spark, f"{corpus_dir}/iob")
    deps = read_deps(spark, f"{corpus_dir}/depsCC")
    res = rule_eval(iob, deps, FIXTURE_DOMAIN).collect()[0]
    # rules must recover the planted gold pairs on the corpus shape too
    assert res.recall_ >= 0.95, res
    assert res.precision_ >= 0.90, res


def test_pdtb_relations_typed_view(spark, tmp_path):
    """Typed PDTB v2 relation reader: column indices and span parsing per
    corpus/pdtb/PDTBRelation.java accessors and Span.java '..' codec."""
    from nlp_lib_spark.sources.readers import read_pdtb_relations
    cols = [""] * 48
    cols[0] = "Explicit"
    cols[1] = "00"
    cols[2] = "0003"
    cols[3] = "517..524;600..610"
    cols[4] = "11,0"
    cols[5] = "because"
    cols[8] = "because"
    cols[11] = "Contingency.Cause.Reason"
    cols[12] = "Expansion.Conjunction"
    cols[22] = "417..515"
    cols[23] = "10"
    cols[24] = "arg1 text here"
    cols[32] = "525..598"
    cols[33] = "11,1"
    cols[34] = "arg2 text here"
    f = tmp_path / "pdtb_sample.pipe"
    f.write_text("|".join(cols) + "\n")
    rows = read_pdtb_relations(spark, str(f)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.rel_type == "Explicit"
    assert r.section == "00" and r.file_number == "0003"
    assert [(s.start, s.end) for s in r.conn_spans] == [(517, 524),
                                                        (600, 610)]
    assert r.conn_raw == "because" and r.conn_head == "because"
    assert r.sense == "Contingency.Cause.Reason"
    assert r.sense2 == "Expansion.Conjunction"
    assert [(s.start, s.end) for s in r.arg1_spans] == [(417, 515)]
    assert r.arg1_gorn == "10" and r.arg1_raw == "arg1 text here"
    assert [(s.start, s.end) for s in r.arg2_spans] == [(525, 598)]
    # empty span -> (-1, -1) sentinel (Span.java:16-19)
    cols[3] = ""
    f.write_text("|".join(cols) + "\n")
    r2 = read_pdtb_relations(spark, str(f)).collect()[0]
    assert [(s.start, s.end) for s in r2.conn_spans] == [(-1, -1)]


def test_nfold_ttest_and_cross_corpus():
    """Fold error rates, paired t, and cross-corpus generalization
    (NFoldTTest / MLExtractor.crossCorporaTest protocols)."""
    from nlp_lib_spark.operators.evaluate import (cross_corpus_eval,
                                                  nfold_error_rates,
                                                  paired_t_statistic)

    # perfectly separable synthetic corpus: feature 'f+' marks positives
    x = [["f+", "ctx"] if i % 2 == 0 else ["f-", "ctx"] for i in range(40)]
    y = [1 if i % 2 == 0 else 0 for i in range(40)]
    rates = nfold_error_rates(x, y, n_folds=5)
    assert len(rates) == 5
    assert all(r == 0.0 for r in rates)

    # paired t: identical systems -> 0; strictly better -> negative
    assert paired_t_statistic(rates, rates) == 0.0
    worse = [r + 0.1 * (k + 1) for k, r in enumerate(rates)]
    assert paired_t_statistic(rates, worse) < 0

    # cross-corpus: same generator -> perfect transfer
    res = cross_corpus_eval(x, y, x[:10], y[:10])
    assert res["precision"] == 1.0 and res["recall"] == 1.0
    assert res["f1"] == 1.0 and res["tp"] == 5


def test_dedup_operators_parametrize_columns(spark):
    """The dedup operators are reusable over arbitrary frames/columns,
    not only the gate's documents view."""
    from nlp_lib_spark.operators.dedup import (doc_fingerprint, exact_dedup,
                                               minhash_lsh_pairs)
    rows = [(1, "alpha beta gamma delta"), (2, "ALPHA beta gamma delta"),
            (3, "totally different content here"),
            (4, "alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "item_id long, body string")
    groups = {r.text_hash: (r.keeper_doc_id, r.n_copies)
              for r in exact_dedup(df, "item_id", "body").collect()}
    assert sorted(v for v in groups.values()) == [(1, 3), (3, 1)]
    fps = {r.item_id: r.bag_fp
           for r in doc_fingerprint(df, "item_id", "body").collect()}
    assert fps[1] == fps[4] and fps[1] != fps[3]
    pairs = {(r.doc_a, r.doc_b)
             for r in minhash_lsh_pairs(df, "item_id", "body").collect()}
    assert (1, 4) in pairs and (1, 3) not in pairs


def test_kmeans_ivf_recall_vs_bruteforce(spark):
    """The k-means coarse quantizer must hold recall in 64 dims where the
    2-dim grid demo collapses; determinism across runs is exact (integer
    Lloyd arithmetic)."""
    from nlp_lib_spark.operators.dedup import (ann_topk_bruteforce,
                                               ann_topk_kmeans_ivf)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    bf = {(r.query_id, r.neighbor_id)
          for r in ann_topk_bruteforce(emb, k=3).collect()}
    km1 = {(r.query_id, r.neighbor_id, r.sim)
           for r in ann_topk_kmeans_ivf(emb, k=3).collect()}
    km2 = {(r.query_id, r.neighbor_id, r.sim)
           for r in ann_topk_kmeans_ivf(emb, k=3).collect()}
    assert km1 == km2
    pairs = {(q, n) for (q, n, _s) in km1}
    assert len(bf & pairs) / len(bf) >= 0.8


def test_pdtb_to_conn_training_rows(spark, tmp_path):
    """PDTB2ConnDB transform: explicit connective spans become B/I-CONN
    rows in the sentence whose raw-document offsets contain them."""
    from nlp_lib_spark.sources.pdtb_prep import explicit_conn_training_rows
    from nlp_lib_spark.sources.readers import read_pdtb_relations
    # raw doc: "the spark binds . however , the table merges because of x ."
    #           0123456789...
    doc = "the spark binds . however , the table merges because of x ."
    s1 = "the spark binds ."
    s2 = "however , the table merges because of x ."
    off2 = doc.index(s2)
    conn1 = doc.index("however")
    conn2 = doc.index("because")
    cols = [""] * 48
    cols[0] = "Explicit"
    cols[3] = f"{conn1}..{conn1 + len('however') - 1}"
    cols[5] = "however"
    cols[8] = "however"
    cols[11] = "Comparison"
    line1 = "|".join(cols)
    cols[3] = f"{conn2}..{conn2 + len('because') - 1}"
    cols[5] = cols[8] = "because"
    cols[11] = "Contingency"
    line2 = "|".join(cols)
    pipe = tmp_path / "wsj_0001.pipe"
    pipe.write_text(line1 + "\n" + line2 + "\n")
    rels = read_pdtb_relations(spark, str(pipe))
    fname = rels.select("file").first().file
    sentences = spark.createDataFrame(
        [(fname, 0, 0, s1), (fname, 1, off2, s2)],
        "file string, sent_id int, start_offset int, text string")
    rows = {r.conn_head: r for r in
            explicit_conn_training_rows(rels, sentences).collect()}
    assert set(rows) == {"however", "because"}
    hw = rows["however"]
    assert hw.sent_id == 1 and hw.sense == "Comparison"
    assert list(hw.iob) == ["B-CONN"] + ["O"] * 8
    bc = rows["because"]
    assert bc.sent_id == 1
    assert list(bc.iob) == ["O"] * 5 + ["B-CONN"] + ["O"] * 3
    assert list(bc.tokens) == s2.split(" ")


def test_trees_to_raw_drops_traces(spark):
    from nlp_lib_spark.sources.pdtb_prep import trees_to_raw
    df = spark.createDataFrame(
        [(0, "(S (NP (NN spark)) (VP (VBZ binds) (-NONE- *T*) (NP (DT the) (NN table))))"),
         (1, "(ROOT)")],
        "tree_id int, tree string")
    got = {r.tree_id: r.raw for r in trees_to_raw(df).collect()}
    assert got[0] == "spark binds the table"
    assert got[1] == ""


def test_candidate_recall_eval_on_corpus(spark, corpus_dir):
    """NewRuleExtractor analogue: the ppi.Rule1+2+3 candidate union must
    cover the planted gold pairs (the driver's miss counter) without
    flooding fp (no negative pairs are planted in this fixture)."""
    from nlp_lib_spark.operators.evaluate import candidate_recall_eval
    iob = read_iob_corpus(spark, f"{corpus_dir}/iob")
    deps = read_deps(spark, f"{corpus_dir}/depsCC")
    res = candidate_recall_eval(iob, deps, FIXTURE_DOMAIN).collect()[0]
    assert res.tp > 0, res
    assert res.miss <= res.tp, res  # candidates cover most planted gold
    assert res.fp == 0, res         # fixture plants no negative pairs


def test_pdtb_corpus_stats(spark, tmp_path):
    """Analyzer aggregate parity on a planted pipe fixture: type tallies,
    explicit conn-head frequencies, sense distribution."""
    from nlp_lib_spark.sources.pdtb_prep import pdtb_corpus_stats
    from nlp_lib_spark.sources.readers import read_pdtb_relations
    cols = [""] * 48
    rows = []
    for (typ, head, sense) in [("Explicit", "because", "Contingency.Cause"),
                               ("Explicit", "because", "Contingency.Cause"),
                               ("Explicit", "but", "Comparison"),
                               ("Implicit", "", "Expansion")]:
        c = list(cols)
        c[0] = typ
        c[8] = head
        c[11] = sense
        rows.append("|".join(c))
    p = tmp_path / "x.pipe"
    p.write_text("\n".join(rows) + "\n")
    rels = read_pdtb_relations(spark, str(p))
    stats = {(r.stat, r.key): r.n
             for r in pdtb_corpus_stats(rels).collect()}
    assert stats[("rel_type", "Explicit")] == 3
    assert stats[("rel_type", "Implicit")] == 1
    assert stats[("conn_head", "because")] == 2
    assert stats[("conn_head", "but")] == 1
    assert stats[("sense", "Contingency.Cause")] == 2
    assert ("conn_head", "") not in stats  # implicit rows excluded


def test_biodrb_reader_and_conn_shrink(spark, tmp_path):
    from nlp_lib_spark.sources.pdtb_prep import biodrb_conn_iob_rows
    from nlp_lib_spark.sources.readers import read_biodrb_relations
    cols = [""] * 21
    cols[0] = "Explicit"
    cols[1] = "10..18"
    cols[7] = "because"
    cols[8] = "Contingency"
    cols[19] = "it rains"
    cols[20] = "20..28"
    p = tmp_path / "b.pipe"
    p.write_text("|".join(cols) + "\n")
    r = read_biodrb_relations(spark, str(p)).collect()[0]
    assert r.rel_type == "Explicit" and r.sense == "Contingency"
    assert r.conn_spans[0].asDict() == {"start": 10, "end": 18}
    assert r.arg2_raw == "it rains"

    rows = [("d1", 0,
             ["perhaps", "because", "of", "that", ",", "it", "works"],
             ["B-c", "I-c", "I-c", "I-c", "O", "O", "O"]),
            ("d1", 1,
             ["xyzzy", "qwerty", "stays"],
             ["B-c", "I-c", "O"])]
    df = spark.createDataFrame(
        rows, "doc_id string, sent_id int, tokens array<string>, "
              "conn array<string>")
    got = {(r.doc_id, r.sent_id): list(r.conn)
           for r in biodrb_conn_iob_rows(df).collect()}
    # 'because' is the longest base-connective sub-span of the annotated
    # region in the default lexicon; the unknown span goes fully O
    assert got[("d1", 0)] == ["O", "B-conn", "O", "O", "O", "O", "O"]
    assert got[("d1", 1)] == ["O", "O", "O"]


def test_paired_t_statistic_zero_variance_nonzero_mean():
    """Identical per-fold differences are maximally significant — the
    statistic diverges; returning 0.0 would claim 'no difference' for a
    uniformly better system (review finding)."""
    import math
    from nlp_lib_spark.operators.evaluate import paired_t_statistic
    # exactly-representable doubles so the variance is exactly zero
    assert paired_t_statistic([0.25, 0.25, 0.25],
                              [0.125, 0.125, 0.125]) == math.inf
    assert paired_t_statistic([0.125, 0.125], [0.375, 0.375]) == -math.inf
    assert paired_t_statistic([0.1, 0.1], [0.1, 0.1]) == 0.0


def test_null_turn_idx_rows_are_dropped_not_fatal(spark):
    """int(NaN) in the Arrow worker raised on a null turn_idx; the
    boundary guard must drop such rows instead (review finding)."""
    import pandas as pd
    from nlp_lib_spark.fixtures import FIXTURE_CONFIG
    from nlp_lib_spark.operators.extract import extract_triples
    pdf = pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "turn_idx": pd.array([0, None], dtype="Int32"),
        "text": ["the kinase binds the promoter region",
                 "the kinase binds the promoter region"]})
    df = spark.createDataFrame(pdf)
    out = extract_triples(df, FIXTURE_CONFIG).toPandas()
    assert set(out.turn_idx) <= {0}  # the null row vanished, no crash
