"""Analyze rule3(a) path structure: are all prep_between fires dist<=2, and
is the BFS mid-node choice SQL-expressible?"""
from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir))

from nlp_lib_spark.kernels.pipeline import annotate_sentence
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.rules import Sent
from nlp_lib_spark.kernels.text import split_sentences, strip_citations
from nlp_lib_spark.lexicons import TESTDATA_CONFIG
from nlp_lib_spark.operators.transcripts import transcripts_select_sql

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
rows = con.execute(transcripts_select_sql("documents", "duckdb", with_ts=False)
                   ).fetchall()

rt = TESTDATA_CONFIG.build()
hist = Counter()
fired_hist = Counter()
mismatch = 0
checked = 0
for conv_id, turn_idx, role, text, tool in rows:
    if not text:
        continue
    for sid, sentence in enumerate(split_sentences(strip_citations(text))):
        ann = annotate_sentence(rt, sentence)
        if ann is None or ann["entity_count"] <= 1:
            continue
        s = Sent(ann["blinded"], ann["pos"], ann["domain"])
        g = DepGraph(ann["edges"])
        n = len(s)
        dtp = -1
        for i in range(n):
            if (i - dtp) < 5 and s.is_protein(i):
                for j in range(i + 1, n):
                    if s.is_protein(j):
                        labels = g.path_labels(i, j)
                        fired = False
                        if labels:
                            for k in range(1, len(labels)):
                                if labels[k] in ("prep_between", "-prep_between") and \
                                   labels[k - 1] in ("prep_between", "-prep_between"):
                                    fired = True
                                    break
                        L = len(labels) if labels is not None else -1
                        hist[L] += 1
                        if fired:
                            fired_hist[L] += 1
                        checked += 1
                        # candidate SQL condition: exists common node m with
                        # prep_between edges to BOTH i and j (either direction),
                        # AND i,j not adjacent (dist != 1), AND the BFS-chosen
                        # mid is prep_between-linked:
                        # chosen mid for dist-2 = first neighbor (sorted by
                        # (node,label)) of i that is adjacent to j
                        if L == 2:
                            nbrs = g._adj.get(i, [])
                            mid = None
                            for (node, lab) in nbrs:
                                if any(nb == j for (nb, _l) in g._adj.get(node, [])):
                                    mid = (node, lab)
                                    break
                            if mid is not None:
                                m, lab1 = mid
                                lab2 = next(l for (nb, l) in sorted(g._adj.get(m, []))
                                            if nb == j)
                                pred_fire = (lab1.lstrip("-") == "prep_between"
                                             and lab2.lstrip("-") == "prep_between")
                                if pred_fire != fired:
                                    mismatch += 1
                                    print("MISMATCH", sentence, i, j, labels, mid)
            if s.domain[i] is not None:
                dtp = i
print(f"checked={checked} len_hist={dict(hist)} fired_hist={dict(fired_hist)} "
      f"dist2_mid_mismatch={mismatch}")
