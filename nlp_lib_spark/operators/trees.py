"""Constituency-tree operators: per-sentence Penn trees + ST-kernel scores.

Closes the ParserAnnotator slot (reference ling/ann/ParserAnnotator.java:
48-98) end-to-end: the frozen builder (kernels/constit.py) runs inside the
same Arrow ``mapInPandas`` batches as the rest of the annotation chain, so
tree kernels and tree analyzers consume trees derived from raw transcript
text — no gold-tree files required.

Scale shape: both operators are one stateless Arrow pass over the
annotation frame — no shuffle, no driver round-trip; prototypes are a
handful of constant strings captured in the closure (the broadcast-dim
pattern, same as the LCS dep-path kernel runtime in
operators/kernel_score.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from nlp_lib_spark.kernels.constit import build_tree
from nlp_lib_spark.kernels.pipeline import KGConfig, annotate_sentence
from nlp_lib_spark.kernels.tree import parse_penn
from nlp_lib_spark.kernels.treekernel import subtree_kernel

# Prototype sentences for the runtime kernel scorer: one per transcript
# template family that carries a relation verb, pushed through the SAME
# frozen chain as the data (tokenize -> gazetteer -> blind -> simplify ->
# POS -> chunk -> tree) so their trees share the data's vocabulary of
# productions. Deterministic at import time given the config.
PROTO_SENTENCES: tuple[str, ...] = (
    "the spark stream interacts with the hash join .",
    "interaction of the table scan with a row group was observed .",
)


def prototype_trees(config: KGConfig,
                    sentences: tuple[str, ...] = PROTO_SENTENCES
                    ) -> list[str]:
    """Penn trees of the prototype sentences under ``config``'s chain."""
    rt = config.build()
    out = []
    for s in sentences:
        ann = annotate_sentence(rt, s, full=True)
        out.append(build_tree(ann["blinded"], ann["pos"]))
    return out


def trees_from_annotations(ann: DataFrame) -> DataFrame:
    """annotations -> (conv_id, turn_idx, sent_id, tree)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "sent_id": pdf["sent_id"],
                "tree": [build_tree(list(toks), list(pos))
                         for toks, pos in zip(pdf["blinded"], pdf["pos"])],
            })

    return (ann.select("conv_id", "turn_idx", "sent_id", "blinded", "pos")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, tree string"))


def tree_scores(trees: DataFrame, prototypes: list[str]) -> DataFrame:
    """(.., tree) x prototypes -> (.., proto_id, k) ST-kernel scores.

    Parses the tree STRING back (parse_penn), so the gate also
    value-checks the build->parse round trip.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        protos = [(i, parse_penn(p)) for i, p in enumerate(prototypes)]
        for pdf in batches:
            # columnar emission: one score column per prototype over the
            # batch, then a vectorized repeat/tile — building a Python
            # list of |rows|x|protos| tuples here churned the worker
            # allocator hard enough that 32 reused workers retained ~15 GB
            # RSS after one sf0.1 pass (glibc arenas don't shrink); the
            # columnar form allocates O(batch) ndarrays instead
            parsed = [parse_penn(t) for t in pdf["tree"]]
            n, p = len(parsed), len(protos)
            scores = [int(subtree_kernel(t, pt))
                      for t in parsed for _, pt in protos]
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].repeat(p).to_numpy(),
                "turn_idx": pdf["turn_idx"].astype("int32").repeat(p).to_numpy(),
                "sent_id": pdf["sent_id"].astype("int32").repeat(p).to_numpy(),
                "proto_id": [pid for _ in range(n) for pid, _ in protos],
                "k": pd.array(scores, dtype="int64"),
            })

    return (trees.select("conv_id", "turn_idx", "sent_id", "tree")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, proto_id int, k long"))


def tree_dep_edges(trees: DataFrame) -> DataFrame:
    """(.., tree) -> typed-dependency edges (the PTB2Dep slot).

    Reference ``corpus/pdtb/PTB2Dep.java:29-99`` converts every Penn tree
    to Stanford typed dependencies (``gs.typedDependencies()``); here the
    frozen Collins-head converter (kernels/treedep.tree_to_deps) runs in
    one stateless Arrow pass over the tree strings — no shuffle, no
    driver round-trip. Output row per edge, root edge with gov_idx -1 and
    gov_tok 'ROOT' (the reader's ``ROOT-0`` convention)."""
    from nlp_lib_spark.kernels.tree import leaves
    from nlp_lib_spark.kernels.treedep import tree_to_deps

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                root = parse_penn(r.tree)
                if root is None:
                    continue
                words = [l.word for l in leaves(root)]
                for reln, g, d in tree_to_deps(root):
                    rows.append((r.conv_id, int(r.turn_idx), int(r.sent_id),
                                 reln, g, d,
                                 "ROOT" if g < 0 else words[g], words[d]))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "sent_id", "reln",
                "gov_idx", "dep_idx", "gov_tok", "dep_tok"])

    return (trees.select("conv_id", "turn_idx", "sent_id", "tree")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, reln string, "
                                    "gov_idx int, dep_idx int, "
                                    "gov_tok string, dep_tok string"))


def dep_lines(trees: DataFrame) -> DataFrame:
    """(.., tree) -> one ``.dep``-format line per sentence — the exact
    file payload PTB2Dep.java:84-96 writes (tab-separated
    ``reln(gov-G, dep-D)``), so writing these lines per doc_id reproduces
    the reference's deps/ corpus layout and round-trips through
    ``sources/readers.read_deps``."""
    from nlp_lib_spark.kernels.tree import leaves
    from nlp_lib_spark.kernels.treedep import format_dep_line, tree_to_deps

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                root = parse_penn(r.tree)
                if root is None:
                    continue
                words = [l.word for l in leaves(root)]
                rows.append((r.conv_id, int(r.turn_idx), int(r.sent_id),
                             format_dep_line(tree_to_deps(root), words)))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                              "sent_id", "dep_line"])

    return (trees.select("conv_id", "turn_idx", "sent_id", "tree")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, dep_line string"))


def sst_tree_scores(trees: DataFrame, prototypes: list[str],
                    lam: float = 0.5, scale: int = 10_000) -> DataFrame:
    """Collins-Duffy SST kernel (kernels/treekernel.tree_kernel, the
    libsvm/TreeKernel.java:26-110 port) of every sentence tree against
    the broadcast prototypes.

    The SST kernel is float-valued (lambda decay), so the driver gate
    stays on the integer ST kernel (kg_tree_scores); this operator is the
    runtime path for the reference's actual kernel and is pytest-verified
    against a driver-side loop. Scores ship as ``floor(scale * k)`` —
    integer column, so downstream joins/aggregations hash exactly.
    """
    import math

    from nlp_lib_spark.kernels.treekernel import tree_kernel

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        protos = [(i, parse_penn(p)) for i, p in enumerate(prototypes)]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                t = parse_penn(r.tree)
                for pid, pt in protos:
                    k = tree_kernel(t, pt, lam)
                    rows.append((r.conv_id, int(r.turn_idx), int(r.sent_id),
                                 pid, int(math.floor(scale * k))))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                              "sent_id", "proto_id",
                                              "k_scaled"])

    return (trees.select("conv_id", "turn_idx", "sent_id", "tree")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, proto_id int, "
                                    "k_scaled long"))


def sst_tree_scores_exact(trees: DataFrame, prototypes: list[str],
                          scale: int = 10_000) -> DataFrame:
    """Collins-Duffy SST kernel via EXACT dyadic-rational arithmetic
    (kernels/treekernel.tree_kernel_dyadic, lambda = 1/2) — the
    driver-certifiable form of :func:`sst_tree_scores`: ``k = floor(scale
    * K)`` computed in integer arithmetic, so the kg_sst_scores gate can
    hash it against a closed-form DuckDB oracle (the float runtime path
    is pytest-bounded against this one). Same Arrow batch shape:
    prototypes ride the closure, scores emit columnar per batch."""
    from nlp_lib_spark.kernels.treekernel import tree_kernel_dyadic

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        protos = [(i, parse_penn(p)) for i, p in enumerate(prototypes)]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                t = parse_penn(r.tree)
                for pid, pt in protos:
                    kf = tree_kernel_dyadic(t, pt)
                    k = (scale * kf.numerator) // kf.denominator
                    rows.append((r.conv_id, int(r.turn_idx),
                                 int(r.sent_id), pid, int(k)))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                              "sent_id", "proto_id", "k"])

    return (trees.select("conv_id", "turn_idx", "sent_id", "tree")
            .mapInPandas(fn, schema="conv_id string, turn_idx int, "
                                    "sent_id int, proto_id int, k long"))
