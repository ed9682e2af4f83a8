"""PDTB corpus transform: explicit relations -> connective training rows.

Re-expresses the offline prep of ``corpus/pdtb/PDTB2ConnDB.java``
(processExplicitRelations, java:50-120 + process): for every Explicit
relation, each connective char span is located in the raw sentence whose
offsets contain it, and the sentence is emitted as a ``Word CONN`` B/I/O
training row — the ConnDB corpus the connective trainer consumes
(ml/PDTBConnectiveTrainer.java:58).  The reference walks section
directories and writes flat files; here both sides are DataFrames and the
span location is an equi-join + range predicate, so the transform runs
over the whole corpus in one pass.

Inputs:
* ``relations`` — ``sources/readers.read_pdtb_relations`` output;
* ``sentences`` — one row per raw sentence with char offsets:
  ``(file, sent_id, start_offset, text)`` where ``text`` is the
  space-tokenized raw sentence (RawSentence.java semantics: offsets index
  the raw document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHAR_START = ("start_offset + pos + aggregate(slice(toks, 1, pos), 0, "
              "(a, x) -> a + length(x))")


def explicit_conn_training_rows(relations: DataFrame,
                                sentences: DataFrame) -> DataFrame:
    """-> (file, sent_id, conn_head, sense, tokens, iob) per (relation
    span, containing sentence).  A token overlapping the connective char
    span is tagged ``I-CONN``; the token containing the span start is
    ``B-CONN``; everything else ``O``."""
    spans = (relations
             .filter(F.col("rel_type") == "Explicit")
             .select("file", "conn_head", "sense",
                     F.explode("conn_spans").alias("cs"))
             .filter(F.col("cs.start") >= 0))
    s = (sentences
         .withColumn("toks", F.split("text", " "))
         .withColumn("end_offset",
                     F.col("start_offset") + F.length("text") - 1))
    j = spans.join(
        s,
        (spans.file == s.file)
        & (F.col("cs.start") >= s.start_offset)
        & (F.col("cs.end") <= F.col("end_offset"))).drop(s.file)
    return j.select(
        "file", "sent_id", "conn_head", "sense",
        F.col("toks").alias("tokens"),
        F.expr(f"""
transform(toks, (tok, pos) ->
  CASE
    WHEN ({CHAR_START}) <= cs.start
         AND cs.start <= ({CHAR_START}) + length(tok) - 1 THEN 'B-CONN'
    WHEN ({CHAR_START}) <= cs.end
         AND ({CHAR_START}) + length(tok) - 1 >= cs.start THEN 'I-CONN'
    ELSE 'O'
  END)
""").alias("iob"))


def trees_to_raw(trees: DataFrame, tree_col: str = "tree") -> DataFrame:
    """GSPTB2Raw (corpus/pdtb/GSPTB2Raw.java:52-74): gold Penn trees ->
    space-joined raw sentences, dropping trace leaves (preterminal
    ``-NONE-``).  The reference walks section dirs and writes one raw
    file per .mrg; here one Arrow pass adds a ``raw`` column."""
    from collections.abc import Iterator

    import pandas as pd

    from nlp_lib_spark.kernels.tree import leaves, parse_penn

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = []
            for t in pdf[tree_col]:
                root = parse_penn(t) if t else None
                if root is None:
                    raws.append("")
                    continue
                raws.append(" ".join(
                    lf.word for lf in leaves(root)
                    if lf.label != "-NONE-"))
            pdf = pdf.copy()
            pdf["raw"] = raws
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in trees.schema.fields) + ", raw string"
    return trees.mapInPandas(fn, schema=schema)
