"""Distributed legacy-LLL extraction (relx/Relex.java over transcripts).

The reference LLL pipeline (``Relex.testLLLTestingset``, java:569-637) runs
per sentence: tokenize -> GeniaTagger POS/CHUNK -> parse -> CC-processed
deps -> LLLLexicon LEXE annotate -> three-type rule union -> surface
emission via ``getLexChunk`` + hyphen-strip + synonym mapping. The rebuild
re-expresses it as ONE fused ``mapInPandas`` crossing over
``(conv_id, turn_idx, text)`` — the same zero-shuffle hot-path shape as
``operators/extract.extract_triples`` — with the frozen deterministic
annotators standing in for the external taggers/parsers (the established
substitution: kernels/postag, kernels/bio.chunk_bio, kernels/depparse) and
``kernels/lexann.LexSynAnnotator`` as the LLLLexicon
(relx/LLLLexicon.java:24-108; same longest-match-down LEXE semantics).

``correctTokenization`` (java:748-767, paren splitting) is subsumed by the
frozen tokenizer, which already isolates parentheses. Pairs whose resolved
end is not inside a LEXE span are skipped — the reference NPEs on that path
(``getLexChunk`` returns null into ``String.contains``, java:594), so it
never occurs on its corpora; the guard keeps a web-scale run alive.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

from nlp_lib_spark.kernels.bio import chunk_bio
from nlp_lib_spark.kernels.depparse import dep_parse
from nlp_lib_spark.kernels.lexann import LexSynAnnotator
from nlp_lib_spark.kernels.lll_relex import (lex_chunk, lll_interactions,
                                             resolve_surface)
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.stem import stem
from nlp_lib_spark.kernels.text import (split_sentences, strip_citations,
                                        tokenize)

LLL_TRIPLES_SCHEMA = ("conv_id string, turn_idx int, sent_id int, "
                      "agent int, target int, subj string, pred string, "
                      "obj string")


@dataclass(frozen=True)
class LLLConfig:
    """Frozen LLL deployment lexicons (broadcast-sized, compiled once per
    Python worker).

    * ``lexicon_lines`` — LLLLexicon dictionary lines
      (``canonical\\talias...``, relx/LLLLexicon.java:24-51).
    * ``restriction_terms`` — the relex restriction vocabulary
      (``relex_restriction_terms.txt`` token set, Relex.java:46-56).
    * ``domain_terms`` — verb stems for the frozen POS tagger (the slot
      GeniaTagger fills in the reference).
    """

    lexicon_lines: tuple[str, ...]
    restriction_terms: tuple[str, ...]
    domain_terms: tuple[str, ...] = ()
    max_sent_tokens: int = 256

    def build(self) -> "LLLRuntime":
        return LLLRuntime(self)


class LLLRuntime:
    __slots__ = ("lexicon", "restriction", "verb_stems", "max_sent_tokens")

    def __init__(self, cfg: LLLConfig):
        self.lexicon = LexSynAnnotator(list(cfg.lexicon_lines))
        self.restriction = frozenset(t.lower() for t in cfg.restriction_terms)
        self.verb_stems = frozenset(stem(t) for t in cfg.domain_terms)
        self.max_sent_tokens = cfg.max_sent_tokens


def lll_turn(rt: LLLRuntime, text: str) -> list[tuple]:
    """Turn text -> [(sent_id, agent, target, subj, pred, obj)]."""
    out: list[tuple] = []
    cleaned = strip_citations(text)
    for sent_id, sentence in enumerate(split_sentences(cleaned)):
        tokens = tokenize(sentence)
        if not tokens or len(tokens) > rt.max_sent_tokens:
            continue
        lexe = rt.lexicon.annotate(tokens)
        if "B" not in lexe:
            # no lexicon span -> every lex_chunk is None -> nothing can
            # emit; skip the POS/chunk/parse work (the dominant case on
            # a web corpus, and the expensive part of the sentence)
            continue
        pos = pos_tag(tokens, rt.verb_stems)
        chunk = chunk_bio(pos)
        edges = dep_parse(tokens, pos)
        for (a, t) in lll_interactions(tokens, pos, chunk, lexe, edges,
                                       rt.restriction):
            sa = lex_chunk(tokens, lexe, a)
            st = lex_chunk(tokens, lexe, t)
            if sa is None or st is None:  # reference NPE path (java:594)
                continue
            out.append((sent_id, a, t,
                        resolve_surface(sa, rt.lexicon),
                        "genic_interaction",
                        resolve_surface(st, rt.lexicon)))
    return out


def extract_triples_lll(df: DataFrame, config: LLLConfig) -> DataFrame:
    """transcripts -> LLL genic-interaction triples (fused, zero-shuffle)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt = config.build()
        cols = ["conv_id", "turn_idx", "sent_id", "agent", "target",
                "subj", "pred", "obj"]
        for pdf in batches:
            rows = []
            for conv, ti, text in zip(pdf["conv_id"], pdf["turn_idx"],
                                      pdf["text"]):
                if not text:
                    continue
                for (sid, a, t, subj, pred, obj) in lll_turn(rt, text):
                    rows.append((conv, int(ti), sid, a, t, subj, pred, obj))
            yield pd.DataFrame(rows, columns=cols)

    return (df.select("conv_id", "turn_idx", "text")
              # boundary guard: a null turn_idx (possible in any
              # user-supplied frame) reaches the worker as NaN and
              # int(NaN) raises — in a stream that permanently fails
              # the query on the same replayed micro-batch
              .filter("turn_idx IS NOT NULL")
              .mapInPandas(fn, schema=LLL_TRIPLES_SCHEMA))


LLL_ML_SCHEMA = ("conv_id string, turn_idx int, sent_id int, "
                 "e1 int, e2 int, subj string, pred string, obj string, "
                 "p_bp long")

DEFAULT_LLL_ML_MODEL_PATH = os.path.join(
    os.path.dirname(__file__), os.pardir, "models", "lll_me.json")


def lll_config() -> "LLLConfig":
    """The LLL deployment config shared by the gates, the oracle builders,
    the bench harness, and the operational pipeline (lives here so
    consumers that need no oracles — e.g. scripts/run_pipeline.py — do
    not import the gate registry)."""
    from nlp_lib_spark.lexicons import (TESTDATA_DOMAIN_TERMS,
                                        TESTDATA_LLL_LEXICON_LINES,
                                        TESTDATA_LLL_RESTRICTION)
    return LLLConfig(lexicon_lines=TESTDATA_LLL_LEXICON_LINES,
                     restriction_terms=TESTDATA_LLL_RESTRICTION,
                     domain_terms=TESTDATA_DOMAIN_TERMS)


def extract_triples_lll_ml(df: DataFrame, config: LLLConfig,
                           weights: dict, bias: float) -> DataFrame:
    """MERelex runtime path (relx/MERelex.java:41-114): all LEXE-B
    candidate pairs scored by MaxEnt over RelexPipe features; accepted at
    p > 0.5.  Same fused zero-shuffle shape as the rule path; the weight
    map rides the closure and compiles once per worker.  The probability
    ships as integer basis points so the cross-engine value hash cannot
    diverge on float binaries (the kg_ml_triples pattern)."""
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.relex_pipe import relex_features
    from nlp_lib_spark.kernels.scoring import score

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt = config.build()
        cols = ["conv_id", "turn_idx", "sent_id", "e1", "e2",
                "subj", "pred", "obj", "p_bp"]
        for pdf in batches:
            rows = []
            for conv, ti, text in zip(pdf["conv_id"], pdf["turn_idx"],
                                      pdf["text"]):
                if not text:
                    continue
                cleaned = strip_citations(text)
                for sid, sentence in enumerate(split_sentences(cleaned)):
                    tokens = tokenize(sentence)
                    if not tokens or len(tokens) > rt.max_sent_tokens:
                        continue
                    lexe = rt.lexicon.annotate(tokens)
                    bs = [i for i, t in enumerate(lexe) if t == "B"]
                    if len(bs) < 2:
                        continue
                    pos = pos_tag(tokens, rt.verb_stems)
                    g = DepGraph(dep_parse(tokens, pos))
                    for a_i, i in enumerate(bs):
                        for j in bs[a_i + 1:]:
                            p = score(relex_features(tokens, g, i, j),
                                      weights, bias)
                            if p <= 0.5:
                                continue
                            si = lex_chunk(tokens, lexe, i)
                            sj = lex_chunk(tokens, lexe, j)
                            if si is None or sj is None:
                                continue
                            rows.append(
                                (conv, int(ti), sid, i, j,
                                 resolve_surface(si, rt.lexicon),
                                 "genic_interaction",
                                 resolve_surface(sj, rt.lexicon),
                                 int(round(p * 10000))))
            yield pd.DataFrame(rows, columns=cols)

    return (df.select("conv_id", "turn_idx", "text")
              # boundary guard: a null turn_idx (possible in any
              # user-supplied frame) reaches the worker as NaN and
              # int(NaN) raises — in a stream that permanently fails
              # the query on the same replayed micro-batch
              .filter("turn_idx IS NOT NULL")
              .mapInPandas(fn, schema=LLL_ML_SCHEMA))


RELX_SCHEMA = LLL_TRIPLES_SCHEMA  # identical emission shape


def _relx_surface(surface: str, lexicon) -> str:
    """ExtendedRelex's emission normalization (java:124-135): strip to the
    FIRST hyphen when that prefix is a dictionary entry (contrast Relex's
    last-hyphen strip); no synonym mapping."""
    if "-" in surface:
        first = surface[:surface.index("-")]
        if lexicon.contains(first):
            return first
    return surface


def extract_triples_relx(df: DataFrame, config: LLLConfig) -> DataFrame:
    """ExtendedRelex extraction (relx/ExtendedRelex.getInteractions,
    java:60-80): the relx Rule1+Rule2+Rule4 union with first-wins pair
    dedup, fused into the same zero-shuffle pass as the other LLL
    engines."""
    from nlp_lib_spark.kernels.depgraph import DepGraph
    from nlp_lib_spark.kernels.relex_pipe import extended_relex_interactions
    from nlp_lib_spark.kernels.relx_rules import XSent

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt = config.build()
        cols = ["conv_id", "turn_idx", "sent_id", "agent", "target",
                "subj", "pred", "obj"]
        for pdf in batches:
            rows = []
            for conv, ti, text in zip(pdf["conv_id"], pdf["turn_idx"],
                                      pdf["text"]):
                if not text:
                    continue
                cleaned = strip_citations(text)
                for sid, sentence in enumerate(split_sentences(cleaned)):
                    tokens = tokenize(sentence)
                    if not tokens or len(tokens) > rt.max_sent_tokens:
                        continue
                    lexe = rt.lexicon.annotate(tokens)
                    if "B" not in lexe:
                        continue  # no span -> no emission; skip the parse
                    pos = pos_tag(tokens, rt.verb_stems)
                    s = XSent(tokens, pos, lexe)
                    g = DepGraph(dep_parse(tokens, pos))
                    for (a, t) in extended_relex_interactions(
                            s, g, rt.restriction):
                        sa = lex_chunk(tokens, lexe, a)
                        st = lex_chunk(tokens, lexe, t)
                        if sa is None or st is None:  # reference NPE path
                            continue
                        rows.append((conv, int(ti), sid, a, t,
                                     _relx_surface(sa, rt.lexicon),
                                     "genic_interaction",
                                     _relx_surface(st, rt.lexicon)))
            yield pd.DataFrame(rows, columns=cols)

    return (df.select("conv_id", "turn_idx", "text")
              # boundary guard: a null turn_idx (possible in any
              # user-supplied frame) reaches the worker as NaN and
              # int(NaN) raises — in a stream that permanently fails
              # the query on the same replayed micro-batch
              .filter("turn_idx IS NOT NULL")
              .mapInPandas(fn, schema=RELX_SCHEMA))
