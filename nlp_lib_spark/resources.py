"""Zip-safe access to the packaged model files.

A spark-submit deployment ships this package as ``--py-files kgx.zip``,
which puts ``nlp_lib_spark`` on ``sys.path`` INSIDE the zip — a plain
``open(os.path.join(os.path.dirname(__file__), ...))`` then fails with
``NotADirectoryError``.  ``importlib.resources`` reads through both
filesystem and zipimport loaders, so every default-model LOAD goes
through here.  The ``DEFAULT_*_PATH`` constants elsewhere remain for the
training scripts, which WRITE models and always run from a checkout.
"""
from __future__ import annotations

import json
from importlib import resources


def model_json(name: str) -> dict:
    """Parse a packaged model file (``nlp_lib_spark/models/<name>``)."""
    return json.loads(resources.files("nlp_lib_spark")
                      .joinpath("models").joinpath(name).read_text())


def load_packaged_model(name: str) -> tuple[dict[str, float], float]:
    """``(weights, bias)`` from a packaged MaxEnt model json."""
    m = model_json(name)
    return m["weights"], float(m["bias"])
