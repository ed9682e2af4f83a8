"""Corpus readers: the reference's on-disk formats as DataFrame sources.

Formats (SURVEY.md §2.1 / FIXTURES.md §4):

* IOB corpus — blank-line-separated sentences, one token per line,
  ``Word\\tP1\\tP2\\tN1\\tN2`` (reader config ``ppi/MLExtractor.java:51``;
  generic splitter ``io/GenericTextReader.java:24-87``). Entity tokens are
  pre-blinded ``PROTEIN<k>``; P1/P2 (positives) and N1/N2 (negatives) carry
  comma-separated pair ids.
* tree files — one Penn-bracketed tree per sentence line
  (``corpus/pdtb/PTBFileReader.java``); ``(ROOT)`` marks parse failures.
* dep files — per sentence one line of tab-separated ``reln(w-G, w-D)``
  with 1-based indices converted to 0-based, trailing apostrophes on copy
  indices stripped (``ling/SimpleDependency.java:29-70``).
* PDTB piped files — one relation per line, ``|``-separated columns
  (``corpus/pdtb/PDTBPipedFileReader.java``).

Each reader loads whole files (``wholetext``) so record boundaries survive,
parses in an Arrow batch, and yields one row per sentence keyed by
``(doc_id, sent_id)`` — the distributed replacement for the reference's
4-aligned-files document loop (``ppi/MLExtractor.java:58-83``).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_DEP_RE = re.compile(r"(.+?)\((.*), (.*)\)$")


def _whole_files(spark: SparkSession, path: str) -> DataFrame:
    return (spark.read.format("text").option("wholetext", "true").load(path)
            .withColumn("file", F.input_file_name()))


def _doc_id(file_uri: str) -> str:
    return os.path.splitext(os.path.basename(file_uri))[0]


IOB_SCHEMA = ("doc_id string, sent_id int, tokens array<string>, "
              "p1 array<string>, p2 array<string>, "
              "n1 array<string>, n2 array<string>")


def read_iob_corpus(spark: SparkSession, path: str) -> DataFrame:
    """``iob/*.txt`` -> (doc_id, sent_id, tokens, p1, p2, n1, n2)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content, file in zip(pdf["value"], pdf["file"]):
                doc = _doc_id(file)
                for sid, block in enumerate(
                        b for b in content.split("\n\n") if b.strip()):
                    toks, p1, p2, n1, n2 = [], [], [], [], []
                    for line in block.split("\n"):
                        if not line.strip():
                            continue
                        parts = line.split("\t")
                        parts += ["O"] * (5 - len(parts))
                        toks.append(parts[0])
                        p1.append(parts[1])
                        p2.append(parts[2])
                        n1.append(parts[3])
                        n2.append(parts[4])
                    rows.append((doc, sid, toks, p1, p2, n1, n2))
            yield pd.DataFrame(rows, columns=["doc_id", "sent_id", "tokens",
                                              "p1", "p2", "n1", "n2"])

    return _whole_files(spark, path).mapInPandas(fn, schema=IOB_SCHEMA)


def read_trees(spark: SparkSession, path: str) -> DataFrame:
    """``trees/*.mrg`` -> (doc_id, sent_id, tree) one Penn tree per line."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for content, file in zip(pdf["value"], pdf["file"]):
                doc = _doc_id(file)
                for sid, line in enumerate(content.rstrip("\n").split("\n")):
                    rows.append((doc, sid, line))
            yield pd.DataFrame(rows, columns=["doc_id", "sent_id", "tree"])

    return _whole_files(spark, path).mapInPandas(
        fn, schema="doc_id string, sent_id int, tree string")


def parse_dep(raw: str) -> tuple[str, int, int] | None:
    """``reln(w1-G, w2-D)`` -> (reln, G-1, D-1); apostrophed copies kept."""
    m = _DEP_RE.match(raw.strip())
    if not m:
        return None
    reln, left, right = m.groups()

    def idx(tok: str) -> int:
        h = tok.rstrip("'")
        return int(h[h.rindex("-") + 1:]) - 1

    try:
        return (reln, idx(left), idx(right))
    except ValueError:
        return None


DEPS_SCHEMA = ("doc_id string, sent_id int, "
               "edges array<struct<reln string, gov int, dep int>>")


def read_deps(spark: SparkSession, path: str) -> DataFrame:
    """``deps/*.dep`` -> (doc_id, sent_id, edges) per sentence line."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for content, file in zip(pdf["value"], pdf["file"]):
                doc = _doc_id(file)
                for sid, line in enumerate(content.rstrip("\n").split("\n")):
                    edges = []
                    for raw in line.split("\t"):
                        if not raw.strip():
                            continue
                        e = parse_dep(raw)
                        if e is not None:
                            edges.append({"reln": e[0], "gov": e[1],
                                          "dep": e[2]})
                    rows.append((doc, sid, edges))
            yield pd.DataFrame(rows, columns=["doc_id", "sent_id", "edges"])

    return _whole_files(spark, path).mapInPandas(fn, schema=DEPS_SCHEMA)


def read_pdtb_piped(spark: SparkSession, path: str,
                    n_cols: int = 48) -> DataFrame:
    """PDTB v2 piped file -> one row per relation with col_0..col_{n-1}."""
    df = spark.read.text(path).withColumn("file", F.input_file_name())
    cols = [F.split(F.col("value"), r"\|").getItem(i).alias(f"col_{i}")
            for i in range(n_cols)]
    return df.select(F.col("file"), *cols)


def _span_list_expr(col: str):
    """SpanList parse as a JVM-side expression: ``"s..e[;s..e]*"`` ->
    array<struct<start,end>> with -1/-1 for empty spans
    (corpus/pdtb/Span.java:15-25, SpanList.java:15-20)."""
    return F.expr(
        f"transform(split({col}, ';'), x -> IF(x = '', "
        f"named_struct('start', -1, 'end', -1), "
        f"named_struct('start', CAST(split(x, '\\\\.\\\\.')[0] AS INT), "
        f"'end', CAST(split(x, '\\\\.\\\\.')[1] AS INT))))")


def read_pdtb_relations(spark: SparkSession, path: str) -> DataFrame:
    """Typed PDTB v2 relation view, column indices per the reference's
    accessors (corpus/pdtb/PDTBRelation.java:52-119): type=0, section=1,
    file_number=2, conn span/gorn/raw=3/4/5, conn_head=8, senses=11/12,
    arg1 span/gorn/raw=22/23/24, arg2 span/gorn/raw=32/33/34.  Span
    lists become typed arrays; Gorn address lists stay ';'-separated
    strings (consumed by kernels/tree.gorn_node)."""
    raw = read_pdtb_piped(spark, path)
    return raw.select(
        "file",
        F.col("col_0").alias("rel_type"),
        F.col("col_1").alias("section"),
        F.col("col_2").alias("file_number"),
        _span_list_expr("col_3").alias("conn_spans"),
        F.col("col_4").alias("conn_gorn"),
        F.col("col_5").alias("conn_raw"),
        F.col("col_8").alias("conn_head"),
        F.col("col_11").alias("sense"),
        F.col("col_12").alias("sense2"),
        _span_list_expr("col_22").alias("arg1_spans"),
        F.col("col_23").alias("arg1_gorn"),
        F.col("col_24").alias("arg1_raw"),
        _span_list_expr("col_32").alias("arg2_spans"),
        F.col("col_33").alias("arg2_gorn"),
        F.col("col_34").alias("arg2_raw"),
    )


LLL_SCHEMA = ("record_id string, sentence string, "
              "interactions array<struct<agent int, target int>>")


def read_lll(spark: SparkSession, path: str) -> DataFrame:
    """LLL-challenge records -> one row per instance.

    Format (``relx/LLLDataReader.java:18-40`` / ``relx/LLLDataInstance.java``):
    6-line records separated by blank/%-comment lines; ``ID\\t...``,
    ``sentence\\t...``, ``genic_interactions\\tgenic_interaction(a,t)...``.
    """

    def fn(batches):
        for pdf in batches:
            rows = []
            for content, _file in zip(pdf["value"], pdf["file"]):
                count = 0
                buf: list[str] = []
                for line in content.split("\n") + [""]:
                    if line.startswith("%") or not line:
                        if count == 6:
                            rows.append(_parse_lll_record(buf))
                        buf, count = [], 0
                        continue
                    buf.append(line)
                    count += 1
            yield pd.DataFrame(rows, columns=["record_id", "sentence",
                                              "interactions"])

    return _whole_files(spark, path).mapInPandas(fn, schema=LLL_SCHEMA)


def _parse_lll_record(lines: list[str]) -> tuple:
    rid, sentence, inters = "", "", []
    for line in lines:
        if line.startswith("ID"):
            rid = line.split("\t")[1]
        elif line.startswith("sentence"):
            sentence = line.split("\t", 1)[1]
        elif line.startswith("genic_interactions"):
            for token in line.split("\t")[1:]:
                lb, rb = token.index("("), token.index(")")
                comma = token.index(",")
                inters.append({"agent": int(token[lb + 1:comma]),
                               "target": int(token[comma + 1:rb])})
    return (rid, sentence, inters)


def gold_pairs(iob: DataFrame) -> DataFrame:
    """P1/P2 (label=1) and N1/N2 (label=0) pair-id joins -> gold pairs.

    Distributed form of ``RunRelex.getGoldInteractionPairs``
    (relx/ppi/RunRelex.java:154-181) / ``MLExtractor.getInteractionPairs``
    (ppi/MLExtractor.java:336-377): explode comma-separated pair ids per
    token position, equi-join P1-side to P2-side on (doc, sent, pair id).
    """
    def side(col1: str, col2: str, label: int):
        a = (iob.select("doc_id", "sent_id",
                        F.posexplode(col1).alias("pos1", "ids1"))
             .filter(F.col("ids1") != "O")
             .select("doc_id", "sent_id", "pos1",
                     F.explode(F.split("ids1", ", ")).alias("pair_id")))
        b = (iob.select("doc_id", "sent_id",
                        F.posexplode(col2).alias("pos2", "ids2"))
             .filter(F.col("ids2") != "O")
             .select("doc_id", "sent_id", "pos2",
                     F.explode(F.split("ids2", ", ")).alias("pair_id")))
        return (a.join(b, ["doc_id", "sent_id", "pair_id"])
                .select("doc_id", "sent_id",
                        F.col("pos1").alias("e1"),
                        F.col("pos2").alias("e2"),
                        F.lit(label).alias("label")))

    return side("p1", "p2", 1).union(side("n1", "n2", 0)).distinct()


def read_biodrb_relations(spark: SparkSession, path: str) -> DataFrame:
    """Typed BioDRB relation view (corpus/biodrb/BioDRBRelation.java:18-80
    accessor indices: type=0, conn spans=1, conn gorn=2, conn raw=7,
    sense=8, arg1 gorn/raw/spans=12/13/14, arg2 gorn/raw/spans=18/19/20).
    Same pipe transport as the PDTB reader; the span codec is shared."""
    raw = read_pdtb_piped(spark, path)
    return raw.select(
        "file",
        F.col("col_0").alias("rel_type"),
        _span_list_expr("col_1").alias("conn_spans"),
        F.col("col_2").alias("conn_gorn"),
        F.col("col_7").alias("conn_raw"),
        F.col("col_8").alias("sense"),
        F.col("col_12").alias("arg1_gorn"),
        F.col("col_13").alias("arg1_raw"),
        _span_list_expr("col_14").alias("arg1_spans"),
        F.col("col_18").alias("arg2_gorn"),
        F.col("col_19").alias("arg2_raw"),
        _span_list_expr("col_20").alias("arg2_spans"),
    )
