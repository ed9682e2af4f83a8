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


def test_adversarial_fuzz_small_config():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "scripts"))
    from dev_oracle_fuzz import run_fuzz
    assert run_fuzz(150, 777, ["deps", "lll", "lll_ml", "relx"]) == 0
