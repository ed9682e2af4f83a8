"""WGPRelEx secondary entry point: typed genotype/phenotype relations.

Re-expresses ``main/WGPRelEx.java``: input sentences arrive pre-tagged with
typed IOB (``B-G/I-G/B-P/I-P/O`` — FIXTURES.md §7; the reference's reader
uses the compact ``BG/BP/IG/IP`` forms, both accepted here). Blinding uses
the SAME ``PROTEIN<k>`` placeholders as the PPI path (java:242-279) so the
rule union runs unchanged; the surface map carries a ``GENOTYPE-`` /
``PHENOTYPE-`` prefix, and ``filterRelations`` (java:361-376) keeps only
cross-type pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from nlp_lib_spark.kernels.depparse import dep_parse
from nlp_lib_spark.kernels.pipeline import KGConfig, _pred_term
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.rules import predict_interactions


def _norm_tag(tag: str) -> str:
    return tag.replace("-", "").upper()  # B-G -> BG


def blind_typed(tokens: list[str], tags: list[str]
                ) -> tuple[list[str], dict[str, str], int]:
    """WGP prepare (java:242-279): B* spans -> PROTEIN<k>, map value gets
    the GENOTYPE-/PHENOTYPE- prefix."""
    out: list[str] = []
    mapping: dict[str, str] = {}
    count = 0
    entity_count = 0
    i = 0
    n = len(tokens)
    while i < n:
        tag = _norm_tag(tags[i])
        if tag.startswith("B"):
            entity_count += 1
            prefix = "PHENOTYPE" if tag == "BP" else "GENOTYPE"
            surface = [tokens[i]]
            j = i + 1
            while j < n and _norm_tag(tags[j]).startswith("I"):
                surface.append(tokens[j])
                j += 1
            placeholder = f"PROTEIN{count}"
            mapping[placeholder] = prefix + "-" + " ".join(surface)
            out.append(placeholder)
            count += 1
            i = j
        else:
            out.append(tokens[i])
            i += 1
    return out, mapping, entity_count


def typed_relations_for_sentence(rt, tokens: list[str],
                                 tags: list[str]) -> list[tuple]:
    """-> [(genotype, pred, phenotype)] for one typed-IOB sentence."""
    if len(tokens) > rt.max_sent_tokens:  # straggler guard (KGConfig)
        return []
    blinded, mapping, entity_count = blind_typed(tokens, tags)
    if entity_count <= 1 or entity_count > rt.max_mentions:
        return []
    pos = pos_tag(blinded, rt.verb_stems)
    domain = rt.domain.tag(blinded)
    edges = dep_parse(blinded, pos)
    pairs = predict_interactions(blinded, pos, domain, edges)
    out = []
    for (i, j) in sorted(pairs):
        t1 = mapping.get(blinded[i], "")
        t2 = mapping.get(blinded[j], "")
        # filterRelations (java:361-376): cross-type only
        if t1.startswith("GENOTYPE") and t2.startswith("PHENOTYPE"):
            geno, pheno = t1, t2
        elif t2.startswith("GENOTYPE") and t1.startswith("PHENOTYPE"):
            geno, pheno = t2, t1
        else:
            continue
        pred = _pred_term(domain, i, j)
        out.append((geno.split("-", 1)[1], pred, pheno.split("-", 1)[1]))
    return out


def extract_typed_triples(df: DataFrame, config: KGConfig) -> DataFrame:
    """(doc_id, sent_id, tokens, tags) -> genotype/phenotype triples."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt = config.build()
        cols = ["doc_id", "sent_id", "genotype", "pred", "phenotype"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for (g, p, ph) in typed_relations_for_sentence(
                        rt, list(r.tokens), list(r.tags)):
                    rows.append((r.doc_id, int(r.sent_id), g, p, ph))
            yield pd.DataFrame(rows, columns=cols)

    return (df.select("doc_id", "sent_id", "tokens", "tags")
              .mapInPandas(fn, schema="doc_id string, sent_id int, "
                                      "genotype string, pred string, "
                                      "phenotype string"))
