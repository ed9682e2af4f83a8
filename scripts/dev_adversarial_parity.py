"""End-to-end Spark-vs-DuckDB gate parity on an ADVERSARIAL corpus.

The oracle fuzz (dev_oracle_fuzz.py) diffs the *Python kernels* against the
DuckDB SQL replicas; the driver's real comparison is *Spark* against DuckDB.
The mapInPandas paths share the Python kernels, but the dual-dialect
derivation SQL (operators/transcripts.transcripts_select_sql), the
pure-Spark-SQL gates, and the Arrow batching seams are only exercised
end-to-end by the driver corpus. This script closes that gap: it swaps the
fixed documents table for a fuzz-vocabulary one (same schema) and runs the
full all-gate paritycheck, so every gate's Spark plan and DuckDB oracle are
value-hash-compared on text that stresses sentence boundaries, parens,
citations, fused '/'-tokens, case folding, hyphen/apostrophe tokens, and
raw tokens colliding with the PROTEIN placeholder namespace.

Non-document tables (TPC-H dims, embeddings, events) are copied from
sf0.001 so the non-NLP gates still run.

Usage: python3 scripts/dev_adversarial_parity.py [n_docs] [seed]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_BASE_SF = "/root/testdata/sf0.001"
_COPY_TABLES = ("customer", "embeddings", "events", "lineitem", "nation",
                "orders", "part", "region", "supplier")


def build_adversarial_sf(out_dir: str, n_docs: int, seed: int) -> None:
    import duckdb

    from dev_oracle_fuzz import make_docs
    os.makedirs(out_dir, exist_ok=True)
    for t in _COPY_TABLES:
        shutil.copy(f"{_BASE_SF}/{t}.parquet", f"{out_dir}/{t}.parquet")
    docs = make_docs(n_docs, seed)
    con = duckdb.connect()
    con.register("d", docs)
    con.execute(f"""COPY (SELECT doc_id, text, 'en' AS lang,
        'fuzz' AS source, length(text) AS n_chars FROM d)
        TO '{out_dir}/documents.parquet' (FORMAT PARQUET)""")


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20250817
    from nlp_lib_spark.paritycheck import run_all
    from nlp_lib_spark.session import get_spark
    with tempfile.TemporaryDirectory() as td:
        build_adversarial_sf(td, n_docs, seed)
        spark = get_spark(cpus=8)
        try:
            results = run_all(spark, td)
            bad = [r for r in results if r.get("status") != "ok"]
            for r in bad:
                print("BAD:", r)
            print(f"adversarial parity: {len(results) - len(bad)} ok, "
                  f"{len(bad)} bad (n_docs={n_docs}, seed={seed})")
            return 1 if bad else 0
        finally:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
