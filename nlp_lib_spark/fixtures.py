"""Deterministic synthetic transcript fixtures with planted gold triples.

Implements FIXTURES.md: seeded (seed=42) template-generated multi-turn
transcripts whose every sentence carries its gold (subj, pred, obj) set at
generation time, so pipeline P/R is exact. Templates cover the constructs
the reference strips/detects: subject-verb-object domain verbs (form 1),
nominal relation + prepositions (forms 2/3), fused ``a/b`` tokens (form 4),
``between X and Y`` (Rule3), negated relations (must NOT emit,
RelexRule1.java:214-226), parenthesized asides, citation brackets, and
trivial <=1-entity sentences. Conversation lengths are long-tailed (1..40
turns) to exercise skew.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from nlp_lib_spark.kernels.domain import DomainAnnotator
from nlp_lib_spark.kernels.pipeline import KGConfig

FIXTURE_ENTITIES: tuple[str, ...] = (
    "TagA", "TagB", "GerE", "cotD", "p53", "p21", "bcl-2", "raf kinase",
    "raf kinase inhibitor", "cyclin D1", "sigma K", "spo0A", "yfhP",
    "MyoD", "cdk2",
)

FIXTURE_DOMAIN: tuple[str, ...] = (
    "interact", "interacts", "interaction", "bind", "binds", "binding",
    "regulate", "regulates", "regulation", "activate", "activates",
    "activation", "inhibit", "inhibits", "inhibition", "phosphorylate",
    "phosphorylates", "association", "associate",
)

FIXTURE_CONFIG = KGConfig(entity_names=FIXTURE_ENTITIES,
                          domain_terms=FIXTURE_DOMAIN)

_DOMAIN = DomainAnnotator(FIXTURE_DOMAIN)


def _dval(word: str) -> str:
    """The DOMAIN tag value the annotator assigns to this token."""
    tags = _DOMAIN.tag([word])
    assert tags[0] is not None, word
    return tags[0]


@dataclass
class Sent:
    text: str
    gold: list[tuple[str, str, str]]  # (subj, pred, obj)


def _simple_entities(rng: random.Random) -> tuple[str, str]:
    """Two distinct single- or multi-word entities, neither a prefix of the
    other (prefix pairs collapse into one mention by design)."""
    while True:
        a, b = rng.sample(FIXTURE_ENTITIES, 2)
        al, bl = a.lower(), b.lower()
        if not al.startswith(bl) and not bl.startswith(al):
            return a, b


def _templates(rng: random.Random) -> Sent:
    a, b = _simple_entities(rng)
    roll = rng.randrange(10)
    if roll == 0:
        v = rng.choice(("interacts", "binds"))
        return Sent(f"the {a} {v} with the {b} .",
                    [(a, _dval(v), b)])
    if roll == 1:
        return Sent(f"{a} binds to {b} [ 12 , 3 ] .", [(a, _dval("binds"), b)])
    if roll == 2:
        n = rng.choice(("interaction", "association"))
        return Sent(f"{n} of {a} with {b} was observed .",
                    [(a, _dval(n), b)])
    if roll == 3:
        return Sent(f"the {a} does not regulate the {b} .", [])
    if roll == 4:
        return Sent(
            f"the association between {a} and {b} suggests binding .",
            [(a, "association", b)])
    if roll == 5:  # fused same-token pair (form 4 / RelexRule5)
        x, y = rng.sample(("p53", "p21", "TagA", "TagB", "cotD"), 2)
        return Sent(f"the {x}/{y} interaction was reported .",
                    [(x, "interaction", y)])
    if roll == 6:  # parenthesized entity-less aside survives simplify
        v = rng.choice(("activates", "inhibits"))
        return Sent(f"the {a} ( see above ) {v} the {b} .",
                    [(a, _dval(v), b)])
    if roll == 7:  # single entity -> trivial skip
        return Sent(f"the {a} was purified yesterday .", [])
    if roll == 8:  # no entities at all
        return Sent("the binding buffer was replaced today .", [])
    # conjunction distribution
    c = rng.choice([e for e in ("GerE", "MyoD", "cdk2") if e not in (a, b)])
    v = _dval("interacts")
    return Sent(f"the {a} interacts with {b} and {c} .",
                [(a, v, b), (a, v, c)])


_DISC_ENTS: tuple[str, ...] = (
    "spark", "table", "row", "window", "key", "value", "batch", "stream",
    "column", "query", "data", "part", "customer", "vector",
)
_DISC_VERBS: tuple[str, ...] = ("binds", "regulates", "inhibits",
                                "activates")
# (connective, verb-context?) — ambiguous connectives appear in BOTH a
# verb-chunk-right context ("{conn} {verb} the {e}") and a noun-right one;
# unambiguous connectives get mixed surroundings for class coverage.
_DISC_AMBIG: tuple[str, ...] = ("since", "when", "but", "then")
_DISC_PLAIN: tuple[str, ...] = (
    "because", "therefore", "thus", "however", "although", "whereas",
    "moreover", "furthermore", "also", "after", "before", "meanwhile",
)


def generate_discourse_turns(n_turns: int = 600,
                             seed: int = 42) -> list[str]:
    """Connective-rich synthetic turn texts over the TESTDATA vocabulary —
    the training corpus for the sense classifier (the testdata documents
    themselves only realize 'however'/'moreover', so this generator plants
    every lexicon connective, and plants the ambiguous ones in both the
    verb-right and noun-right contexts the synthetic annotation rule keys
    on; see scripts/train_sense.py).  Separate from generate_transcripts
    on purpose: its seeded stream must stay byte-identical."""
    rng = random.Random(seed)
    out = []
    for _ in range(n_turns):
        a, b, c = rng.sample(_DISC_ENTS, 3)
        v1, v2 = rng.choice(_DISC_VERBS), rng.choice(_DISC_VERBS)
        kind = rng.randrange(4)
        if kind < 2:  # ambiguous connective, both contexts
            conn = rng.choice(_DISC_AMBIG)
            if kind == 0:  # verb chunk right of the connective
                text = f"the {a} {v1} the {b} {conn} {v2} the {c} ."
            else:
                text = (f"the {a} {v1} the {b} {conn} the {c} "
                        f"was observed .")
        elif kind == 2:  # sentence-initial unambiguous
            conn = rng.choice(_DISC_PLAIN)
            text = f"{conn} , the {a} {v1} the {b} ."
        else:  # medial unambiguous
            conn = rng.choice(_DISC_PLAIN)
            text = f"the {a} {v1} the {b} {conn} the {c} {v2} the {a} ."
        out.append(text)
    return out


def generate_transcripts(n_convs: int = 60, seed: int = 42):
    """Returns (turn_rows, gold_rows).

    turn_rows: (conv_id, turn_idx, role, text, tool, ts_epoch)
    gold_rows: (conv_id, turn_idx, sent_id, subj, pred, obj)
    """
    rng = random.Random(seed)
    roles = ("user", "assistant", "tool")
    turns, gold = [], []
    ts = 1_700_000_000
    for ci in range(n_convs):
        conv_id = f"conv_{ci:05d}"
        # long-tailed conversation length
        n_turns = min(40, max(1, int(rng.paretovariate(1.2))))
        for ti in range(n_turns):
            n_sents = rng.randrange(1, 4)
            sents = [_templates(rng) for _ in range(n_sents)]
            text = " ".join(s.text for s in sents)
            role = roles[ti % 3]
            tool = "search" if role == "tool" else None
            turns.append((conv_id, ti, role, text, tool, ts))
            ts += 7
            for sid, s in enumerate(sents):
                for (subj, pred, obj) in s.gold:
                    gold.append((conv_id, ti, sid,
                                 subj.lower(), pred, obj.lower()))
    return turns, gold
