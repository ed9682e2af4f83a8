"""The packaged-model loader must work when nlp_lib_spark is imported
from a zip, the way ``spark-submit --py-files kgx.zip`` ships it.

Plain ``open(os.path.dirname(__file__)/../models/...)`` fails inside a
zip with NotADirectoryError — the regression this locks out.  The test
runs a subprocess whose job file lives OUTSIDE the repo (Python puts the
job file's directory at ``sys.path[0]``, so a repo-resident script would
silently import the checkout instead of the zip) with only the zip on
``PYTHONPATH``, in isolated mode so no ambient path leaks in.
"""
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """\
import json, sys
sys.path.insert(0, sys.argv[1])  # the zip — the only resolution path
import nlp_lib_spark
assert ".zip" in nlp_lib_spark.__file__, (
    "package resolved from %s, not the zip" % nlp_lib_spark.__file__)
from nlp_lib_spark.resources import load_packaged_model, model_json
for name in ("ppi_maxent.json", "lll_me.json", "discourse_crf.json",
             "aimed_me.json", "sense_me.json"):
    m = model_json(name)
    assert m["weights"], name
weights, bias = load_packaged_model("ppi_maxent.json")
assert isinstance(bias, float) and weights
print(json.dumps({"ok": True, "n_w": len(weights)}))
"""


def test_models_load_from_zip(tmp_path):
    zip_path = tmp_path / "kgx.zip"
    pkg = os.path.join(REPO, "nlp_lib_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    # -I: isolated mode drops the script dir, cwd, ambient PYTHONPATH and
    # user site from sys.path, so the argv-injected zip is the ONLY way
    # the package can resolve
    out = subprocess.run(
        [sys.executable, "-I", str(job), str(zip_path)],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["ok"] and res["n_w"] > 0
