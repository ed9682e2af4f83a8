"""Default deployment lexicons.

Two worlds:

* ``TESTDATA_*`` — built for the driver-generated synthetic corpus under
  ``/root/testdata`` (the ``documents`` table vocabulary), used by the
  benchmark and the driver-gate queries. Entities are data-engineering
  noun phrases occurring in that vocabulary (including multi-word names and
  names that are prefixes of longer names, exercising the prefix-extension
  gazetteer); domain terms are relation verbs/nominals injected by the
  transcript derivation plus vocabulary verbs.
* Test fixtures build their own small lexicons inline (see tests/).

Shapes follow the reference's resource files: entity lexicon = one name per
line (``main/WBioRelEx.java:431-444``), domain terms = one per line
(``ppi/BioDomainAnnotator.java:30``).
"""

from __future__ import annotations

from nlp_lib_spark.kernels.pipeline import KGConfig

TESTDATA_ENTITIES: tuple[str, ...] = (
    "spark",
    "hash",
    "hash join",
    "table",
    "table scan",
    "row",
    "row group",
    "column",
    "vector",
    "stream",
    "window",
    "key",
    "batch",
    "customer",
    "query",
    "data",
    "line",
    "value",
    "part",
    "group",
)

TESTDATA_DOMAIN_TERMS: tuple[str, ...] = (
    # relation verbs injected by the transcript derivation templates
    "interact", "interacts", "interaction",
    "bind", "binds", "binding",
    "regulate", "regulates", "regulation",
    "activate", "activates", "activation",
    "associate", "association",
    "inhibit", "inhibits",
    # vocabulary verbs usable as relation terms in the documents world
    "join", "merge", "sort", "filter", "scan",
)

TESTDATA_CONFIG = KGConfig(
    entity_names=TESTDATA_ENTITIES,
    domain_terms=TESTDATA_DOMAIN_TERMS,
)

# Legacy-LLL deployment (operators/lll): dictionary lines follow
# relx/LLLLexicon.java:24-51 (tab-separated, first column canonical); the
# synonym aliases below exercise the has_synonym emission path on real
# corpus tokens. Restriction terms are the relex_restriction_terms.txt
# token set (Relex.java:46-56) — surface forms, matched against chunk
# words, so inflected variants are listed explicitly.
TESTDATA_LLL_LEXICON_LINES: tuple[str, ...] = TESTDATA_ENTITIES + (
    "join\tmerge",
    "scan\tfilter",
)

TESTDATA_LLL_RESTRICTION: tuple[str, ...] = (
    "interacts", "interact", "interaction",
    "binds", "bind", "binding",
    "regulates", "regulate", "regulation",
    "activates", "activate", "activation",
    "association", "associates",
    "inhibits", "inhibit",
)
