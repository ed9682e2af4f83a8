"""Clause segmentation + BIO span operators over the annotations table."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from nlp_lib_spark.kernels.bio import decode_bio
from nlp_lib_spark.kernels.clauses import clause_spans


def with_clauses(ann: DataFrame) -> DataFrame:
    """annotations -> one row per clause span (conv, turn, sent, span)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                tokens = list(r.blinded)
                pos = list(r.pos)
                if not tokens or len(pos) != len(tokens):
                    continue
                for cid, (s, e) in enumerate(clause_spans(tokens, pos)):
                    rows.append((r.conv_id, int(r.turn_idx), int(r.sent_id),
                                 cid, s, e, " ".join(tokens[s:e + 1])))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "sent_id", "clause_id",
                "start", "end", "clause_text"])

    return (ann.select("conv_id", "turn_idx", "sent_id", "blinded", "pos")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, clause_id int, start int, "
                                    "end int, clause_text string"))


def entity_spans(ann: DataFrame) -> DataFrame:
    """annotations -> decoded BIO entity spans over the raw token layer."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                tokens = list(r.tokens)
                for (s, e, typ) in decode_bio(list(r.iob)):
                    rows.append((r.conv_id, int(r.turn_idx), int(r.sent_id),
                                 s, e, typ, " ".join(tokens[s:e + 1])))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "sent_id", "start", "end",
                "span_type", "span_text"])

    return (ann.select("conv_id", "turn_idx", "sent_id", "tokens", "iob")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, start int, end int, "
                                    "span_type string, span_text string"))
