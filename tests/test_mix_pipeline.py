"""Composition contracts of the end-to-end training-mix pipeline gate
(gate.doc_mix_pipeline): the stage verdicts must reconcile with the
individually-certified member operators, and the bin layout must cover
exactly the kept set."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mix_rows(spark):
    from nlp_lib_spark.gate import QUERIES
    return {r["doc_id"]: r.asDict()
            for r in QUERIES["doc_mix_pipeline"](spark, SF).collect()}


def test_verdict_composition(mix_rows):
    for r in mix_rows.values():
        assert r["mix_eligible"] == (r["mix_quality"] & r["mix_keeper"]
                                     & r["mix_cont_free"])
        assert r["mix_kept"] == (r["mix_eligible"] & r["mix_sampled"])


def test_pack_covers_exactly_the_kept_set(mix_rows):
    for r in mix_rows.values():
        if r["mix_kept"] == 1:
            assert r["mix_shard"] == r["doc_id"] % 8
            assert r["mix_pack_id"] >= 0
            assert r["mix_cum_tokens"] > 0
        else:
            assert (r["mix_shard"], r["mix_cum_tokens"],
                    r["mix_pack_id"]) == (-1, -1, -1)


def test_stage_verdicts_match_member_operators(spark, mix_rows):
    from nlp_lib_spark.gate import QUERIES
    from nlp_lib_spark.operators.sampling import sample_flags
    qm = {r["doc_id"]: r["qm_pred"]
          for r in QUERIES["doc_quality_model"](spark, SF).collect()}
    keep = {r["keeper_doc_id"]
            for r in QUERIES["dedup_exact"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    samp = {r["doc_id"]: r["sampled"]
            for r in sample_flags(docs, {}, strata_col="doc_id",
                                  salt="mix", default_frac=0.8).collect()}
    for i, r in mix_rows.items():
        assert r["mix_quality"] == qm[i]
        assert r["mix_keeper"] == (1 if i in keep else 0)
        assert r["mix_sampled"] == samp[i]


def test_mix_is_nonempty_and_selective(mix_rows):
    kept = sum(r["mix_kept"] for r in mix_rows.values())
    assert 0 < kept < len(mix_rows)
    # packing is contiguous per shard over the kept docs: cum_tokens
    # strictly increases with doc_id within a shard
    by_shard: dict[int, list] = {}
    for r in sorted(mix_rows.values(), key=lambda r: r["doc_id"]):
        if r["mix_kept"] == 1:
            by_shard.setdefault(r["mix_shard"], []).append(
                r["mix_cum_tokens"])
    for cums in by_shard.values():
        assert cums == sorted(cums)
        assert len(set(cums)) == len(cums)
