"""WGP typed-entity path: blinding prefixes + cross-type filter."""

from __future__ import annotations

import pandas as pd

from nlp_lib_spark.fixtures import FIXTURE_CONFIG
from nlp_lib_spark.operators.wgp import (blind_typed, extract_typed_triples,
                                         typed_relations_for_sentence)


def test_blind_typed_prefixes():
    tokens = ["the", "spo0A", "mutant", "shows", "delayed", "sporulation", "."]
    tags = ["O", "B-G", "I-G", "O", "B-P", "I-P", "O"]
    blinded, mapping, count = blind_typed(tokens, tags)
    assert blinded == ["the", "PROTEIN0", "shows", "PROTEIN1", "."]
    assert mapping == {"PROTEIN0": "GENOTYPE-spo0A mutant",
                       "PROTEIN1": "PHENOTYPE-delayed sporulation"}
    assert count == 2
    # compact reference tags (BG/IP) accepted too
    b2, m2, c2 = blind_typed(["x", "y"], ["BG", "BP"])
    assert m2 == {"PROTEIN0": "GENOTYPE-x", "PROTEIN1": "PHENOTYPE-y"}


def test_cross_type_filter():
    rt = FIXTURE_CONFIG.build()
    tokens = "the spo0A mutant interacts with the delayed sporulation .".split()
    tags = ["O", "B-G", "I-G", "O", "O", "O", "B-P", "I-P", "O"]
    rels = typed_relations_for_sentence(rt, tokens, tags)
    assert rels == [("spo0A mutant", "interacts", "delayed sporulation")]
    # same-type pair must NOT emit
    tags_same = ["O", "B-G", "I-G", "O", "O", "O", "B-G", "I-G", "O"]
    assert typed_relations_for_sentence(rt, tokens, tags_same) == []


def test_extract_typed_triples_spark(spark):
    rows = [
        ("d1", 0, "geneA interacts with slow growth .".split(),
         ["B-G", "O", "O", "B-P", "I-P", "O"]),
        ("d1", 1, "nothing here .".split(), ["O", "O", "O"]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "sent_id", "tokens", "tags"]))
    out = extract_typed_triples(df, FIXTURE_CONFIG).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.genotype, r.phenotype) == ("geneA", "slow growth")
