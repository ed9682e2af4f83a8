"""Pure-Python per-sentence kernels (no Spark imports).

These are the deterministic, frozen NLP primitives of the engine. They are
shared verbatim between the distributed operators (executed inside Arrow
pandas UDFs) and the single-process oracle used by the test-suite, so any
Spark-vs-oracle diff isolates a distribution bug rather than model drift.
"""

from nlp_lib_spark.kernels.text import strip_citations, split_sentences, tokenize
from nlp_lib_spark.kernels.stem import stem
from nlp_lib_spark.kernels.gazetteer import Gazetteer
from nlp_lib_spark.kernels.blind import blind
from nlp_lib_spark.kernels.simplify import simplify
from nlp_lib_spark.kernels.postag import pos_tag
from nlp_lib_spark.kernels.domain import DomainAnnotator
from nlp_lib_spark.kernels.depparse import dep_parse
from nlp_lib_spark.kernels.depgraph import DepGraph
from nlp_lib_spark.kernels.rules import predict_interactions

__all__ = [
    "strip_citations", "split_sentences", "tokenize", "stem", "Gazetteer",
    "blind", "simplify", "pos_tag", "DomainAnnotator", "dep_parse",
    "DepGraph", "predict_interactions",
]
