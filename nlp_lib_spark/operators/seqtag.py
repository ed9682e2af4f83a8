"""Sequence-tagging annotators over the annotations table.

Distributed runtime for the linear-chain tagger family (kernels/crf.py):
the trained weight dict rides in the task closure (broadcast-sized, like
the MaxEnt weights) and every sentence is Viterbi-decoded inside one Arrow
``mapInPandas`` pass — the Spark slot of the reference's
``DiscourseMarkerAnnotator`` / ``ClauseBoundaryCRFAnnotator``
(``CRFSeqTagger.doTagging`` per sentence, ml/crf/CRFSeqTagger.java:49-59).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from nlp_lib_spark.kernels.crf import Weights, tagset_of, viterbi

SEQTAG_SCHEMA = ("conv_id string, turn_idx int, sent_id int, "
                 "tags array<string>")


def crf_annotate(ann: DataFrame, weights: Weights,
                 out_col: str = "tags") -> DataFrame:
    """annotations(blinded, pos) -> per-sentence tag sequences."""
    tags = tagset_of(weights)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                toks = list(r.blinded)
                pos = list(r.pos)
                rows.append((r.conv_id, int(r.turn_idx), int(r.sent_id),
                             viterbi(toks, pos, tags, weights)))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                              "sent_id", out_col])

    return (ann.select("conv_id", "turn_idx", "sent_id", "blinded", "pos")
            .mapInPandas(fn, schema=SEQTAG_SCHEMA.replace("tags", out_col)))
