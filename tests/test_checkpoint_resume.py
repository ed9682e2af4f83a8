"""Kill-and-resume: byte-identical output, stages skipped on resume."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest

from nlp_lib_spark.fixtures import FIXTURE_CONFIG, generate_transcripts
from nlp_lib_spark.plans.checkpoint import (CheckpointedPipeline, Stage,
                                            kg_stages)


def _dir_hash(path: str) -> str:
    h = hashlib.md5()
    for f in sorted(glob.glob(f"{path}/data/part-*.parquet")):
        with open(f, "rb") as fh:
            h.update(hashlib.md5(fh.read()).digest())
    return h.hexdigest()


@pytest.fixture()
def fixture_df(spark):
    import pandas as pd
    turns, _ = generate_transcripts(n_convs=20, seed=11)
    return spark.createDataFrame(pd.DataFrame(
        turns, columns=["conv_id", "turn_idx", "role", "text", "tool",
                        "ts_epoch"]))


def _stages(fixture_df):
    from nlp_lib_spark.operators.extract import annotate_turns, extract_triples

    return [
        Stage("transcripts", lambda sp, o: fixture_df.repartition(4, "conv_id")
              .sortWithinPartitions("conv_id", "turn_idx")),
        Stage("annotations",
              lambda sp, o: annotate_turns(o["transcripts"], FIXTURE_CONFIG)),
        Stage("triples",
              lambda sp, o: extract_triples(o["transcripts"], FIXTURE_CONFIG)),
    ]


def test_checkpoint_resume_exact(spark, fixture_df, tmp_path):
    root = str(tmp_path / "ckpt")
    p1 = CheckpointedPipeline(spark, root, _stages(fixture_df))
    out1 = p1.run()
    assert all(p1.computed.values())
    n1 = out1["triples"].count()
    h1 = _dir_hash(f"{root}/triples")

    # resume with nothing lost: all stages skipped, same data
    p2 = CheckpointedPipeline(spark, root, _stages(fixture_df))
    out2 = p2.run()
    assert not any(p2.computed.values())
    assert out2["triples"].count() == n1
    assert _dir_hash(f"{root}/triples") == h1

    # simulate kill between stage 2 and 3: lose the triples stage
    p2.invalidate("triples")
    import shutil
    shutil.rmtree(f"{root}/triples", ignore_errors=True)
    p3 = CheckpointedPipeline(spark, root, _stages(fixture_df))
    out3 = p3.run()
    assert p3.computed == {"transcripts": False, "annotations": False,
                           "triples": True}
    # byte-identical resume (same upstream checkpoint -> same partitions)
    assert _dir_hash(f"{root}/triples") == h1
    assert out3["triples"].count() == n1

    # lineage written per stage
    for s in ("transcripts", "annotations", "triples"):
        assert os.path.exists(f"{root}/{s}/_LINEAGE_OK")
        lin = spark.read.parquet(f"{root}/{s}/lineage")
        assert lin.count() >= 1
        assert set(lin.columns) == {"partition_id", "n_rows", "checksum",
                                    "stage"}
    assert os.path.exists(f"{root}/_metrics.jsonl")


def test_kg_stages_smoke(spark, tmp_path):
    stages = kg_stages("/root/testdata/sf0.001", __import__(
        "nlp_lib_spark.lexicons", fromlist=["TESTDATA_CONFIG"]).TESTDATA_CONFIG)
    p = CheckpointedPipeline(spark, str(tmp_path / "kg"), stages)
    out = p.run()
    assert out["triples"].count() > 0


def test_resume_invalidates_stale_schema(spark, tmp_path):
    """Review regression: a checkpoint written by an older code version
    (annotations without the 'pairs' column) must be recomputed on
    resume, not fed to downstream stages."""
    import pandas as pd

    from nlp_lib_spark.fixtures import FIXTURE_CONFIG, generate_transcripts
    from nlp_lib_spark.plans.checkpoint import CheckpointedPipeline, kg_stages

    turns, _ = generate_transcripts(n_convs=8, seed=11)
    tdf = pd.DataFrame(turns, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts_epoch"])
    src = spark.createDataFrame(tdf)
    src.createOrReplaceTempView("__ckpt_src")

    stages = kg_stages(None, FIXTURE_CONFIG)
    stages[0].fn = lambda sp, _outs: sp.table("__ckpt_src")
    root = str(tmp_path / "ckpt")

    pipe = CheckpointedPipeline(spark, root, stages)
    outs1 = pipe.run()
    triples1 = sorted(map(tuple, outs1["triples"].collect()))

    # simulate an old-version checkpoint: drop 'pairs' from annotations
    ann_dir = f"{root}/annotations/data"
    old = spark.read.parquet(ann_dir).drop("pairs")
    old.write.mode("overwrite").parquet(ann_dir + "_old")
    import shutil
    shutil.rmtree(ann_dir)
    shutil.move(ann_dir + "_old", ann_dir)

    pipe2 = CheckpointedPipeline(spark, root, kg_stages(None, FIXTURE_CONFIG))
    pipe2.stages[0].fn = lambda sp, _outs: sp.table("__ckpt_src")
    outs2 = pipe2.run()
    assert pipe2.computed["annotations"], "stale schema must recompute"
    assert pipe2.computed["triples"], \
        "dirty cascade must re-derive downstream stages too"
    triples2 = sorted(map(tuple, outs2["triples"].collect()))
    assert triples1 == triples2


def test_recompute_removes_stale_marker_before_overwrite(spark, fixture_df,
                                                         tmp_path):
    """A dep-dirty recompute must drop the stage's old marker BEFORE
    overwriting its data: a kill mid-overwrite would otherwise leave the
    stale marker guarding half-written data, which the next resume would
    trust as complete (review finding)."""
    root = str(tmp_path / "ckpt")
    pipe = CheckpointedPipeline(spark, root, _stages(fixture_df))
    pipe.run()
    marker = f"{root}/triples/_LINEAGE_OK"
    assert os.path.exists(marker)
    # invalidate upstream -> 'triples' becomes dep-dirty; make its
    # recompute die BEFORE any write happens
    pipe.invalidate("transcripts")

    def boom(sp, o):
        raise RuntimeError("killed mid-recompute")

    stages = _stages(fixture_df)
    stages[2] = Stage("triples", boom, deps=("transcripts",))
    pipe2 = CheckpointedPipeline(spark, root, stages)
    try:
        pipe2.run()
        raise AssertionError("expected the injected failure")
    except RuntimeError:
        pass
    # the stale marker must be gone: the half-done stage cannot resume
    # as complete
    assert not os.path.exists(marker)


def test_checkpoint_rejects_remote_root(spark, fixture_df):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="driver-local"):
        CheckpointedPipeline(spark, "s3a://bucket/ckpt",
                             _stages(fixture_df))
