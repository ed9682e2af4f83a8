"""Continuous guard for the oracle canonical-equivalence assumptions.

A small configuration of the adversarial-vocabulary fuzz harness
(scripts/dev_oracle_fuzz.py) runs inside the suite, so an edit to a
kernel or an oracle that breaks the documented equivalences (min-index
first-B, emission-order rank model, structurally-dead branches) fails
here — before the driver's fixed-corpus gate could even notice.
Pure Python + DuckDB; no Spark session needed.
"""

from __future__ import annotations

import os
import sys


def _run(n, seed, whats):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "scripts"))
    from dev_oracle_fuzz import run_fuzz
    return run_fuzz(n, seed, whats)


def test_adversarial_fuzz_small_config():
    assert _run(150, 777, ["deps", "lll", "lll_ml", "relx"]) == 0


def test_adversarial_fuzz_scored_and_discourse_families():
    """The round-2 oracle families: MaxEnt / kernel scoring, typed WGP,
    BFS candidates, Viterbi tagging, and the discourse stack."""
    assert _run(150, 777, ["ml", "kernel", "wgp", "relcand", "crf",
                           "discourse"]) == 0


def test_adversarial_fuzz_hor_nonvacuous():
    """HOR needs triples on BOTH ends of a cross-sentence Arg1 edge —
    rare, so this family runs at a size where it demonstrably fires
    (n=600/seed=1234 yields 12 edges; a 0-item pass would verify
    nothing)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "scripts"))
    import io
    from contextlib import redirect_stdout
    from dev_oracle_fuzz import run_fuzz
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_fuzz(600, 1234, ["hor"])
    out = buf.getvalue()
    print(out, end="")
    assert rc == 0
    items = int(out.split("items=")[1].split()[0])
    assert items > 0, "hor fuzz became vacuous — regenerate the corpus"
