"""Stage checkpointing with per-partition lineage and exact resume.

North-rule obligation (BASELINE.json): every stage checkpoints per-partition
lineage + counters so a killed job resumes from the last complete stage and
reproduces byte-identical output.

Layout per stage under ``root``::

    <root>/<stage>/data/           parquet (Iceberg table in production)
    <root>/<stage>/lineage/        parquet: (stage, partition_id, n_rows, checksum)
    <root>/<stage>/_LINEAGE_OK     marker: stage complete + lineage verified
    <root>/_metrics.jsonl          append-only stage metrics (driver side)

A stage is skipped on resume iff its marker exists; the marker is written
only after the data write finished AND the lineage of the written files was
recomputed and persisted — a half-written stage can never be mistaken for
complete (parquet job-commit + marker ordering).

Checksums are order-insensitive within a partition (bit_xor of row hashes
over the canonical JSON of each row), so lineage verification is stable
under task retries that permute row order inside a partition.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Stage:
    name: str
    # fn(spark, upstream_outputs) -> DataFrame
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    deps: tuple[str, ...] = ()
    # columns the CURRENT code requires of this stage's output; a resumed
    # checkpoint written by an older code version that lacks any of them
    # is invalidated and recomputed instead of poisoning downstream
    # stages with an AnalysisException (schema-upgrade safety)
    required_cols: tuple[str, ...] = ()


def _lineage(df: DataFrame) -> DataFrame:
    cols = df.columns
    return (df
            .withColumn("__pid", F.spark_partition_id())
            .withColumn("__h", F.xxhash64(F.to_json(F.struct(*cols))))
            .groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(__h)").alias("checksum"))
            .select(F.col("__pid").alias("partition_id"),
                    "n_rows", "checksum"))


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str, stages: list[Stage]):
        if "://" in root:
            # stage DATA goes through Spark writers and could target any
            # filesystem, but markers/metrics use driver-local open()/
            # os.path — a remote root would write data then crash at the
            # first marker (and resume would never see markers). Refuse
            # loudly; the production posture for remote storage is an
            # Iceberg table catalog, not this POSIX marker layout.
            raise ValueError(
                f"checkpoint root must be a driver-local path, got {root!r}"
                " (markers and metrics are written with local file I/O)")
        self.spark = spark
        self.root = root.rstrip("/")
        self.stages = stages
        self.computed: dict[str, bool] = {}

    def _paths(self, name: str) -> tuple[str, str, str]:
        base = f"{self.root}/{name}"
        return f"{base}/data", f"{base}/lineage", f"{base}/_LINEAGE_OK"

    def _log_metric(self, rec: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        with open(f"{self.root}/_metrics.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")

    def run(self, inputs: dict[str, DataFrame] | None = None,
            resume: bool = True) -> dict[str, DataFrame]:
        outputs: dict[str, DataFrame] = dict(inputs or {})
        # stages recomputed THIS run; anything depending on one of them
        # must also recompute — a resumed checkpoint derived from data
        # that was just recomputed could be stale.  (After a mid-chain
        # kill, markers form a prefix of the stage order, so the cascade
        # only changes behavior for schema invalidation and explicit
        # invalidate() calls, where it is exactly what is wanted.)
        dirty: set[str] = set()
        for stage in self.stages:
            data_p, lin_p, marker = self._paths(stage.name)
            dep_dirty = any(d in dirty for d in stage.deps)
            if resume and not dep_dirty and os.path.exists(marker):
                resumed = self.spark.read.parquet(data_p)
                missing = set(stage.required_cols) - set(resumed.columns)
                if not missing:
                    outputs[stage.name] = resumed
                    self.computed[stage.name] = False
                    continue
                # stale checkpoint from an older schema — recompute
                self._log_metric({"stage": stage.name,
                                  "event": "schema_invalidated",
                                  "missing_cols": sorted(missing),
                                  "ts": time.time()})
                os.remove(marker)
            dirty.add(stage.name)
            # drop any stale marker BEFORE overwriting the data: the
            # dep-dirty cascade and resume=False reach here with an old
            # marker still on disk, and a kill mid-overwrite must not let
            # the half-written stage resume as complete (the module's
            # core invariant — previously only the schema-invalidation
            # path removed it)
            if os.path.exists(marker):
                os.remove(marker)
            t0 = time.time()
            df = stage.fn(self.spark, outputs)
            df.write.mode("overwrite").parquet(data_p)
            written = self.spark.read.parquet(data_p)
            _lineage(written).withColumn("stage", F.lit(stage.name)) \
                .write.mode("overwrite").parquet(lin_p)
            # totals come from the tiny persisted lineage table — re-using
            # the lin plan here would recompute the full xxhash scan of
            # the stage data a second time just for two numbers
            totals = (self.spark.read.parquet(lin_p)
                      .agg(F.sum("n_rows").alias("rows"),
                           F.count(F.lit(1)).alias("parts")).collect()[0])
            with open(marker, "w") as f:
                f.write(json.dumps({"rows": int(totals.rows or 0),
                                    "partitions": int(totals.parts)}))
            self._log_metric({"stage": stage.name, "event": "complete",
                              "rows": int(totals.rows or 0),
                              "partitions": int(totals.parts),
                              "wall_sec": round(time.time() - t0, 3),
                              "ts": time.time()})
            outputs[stage.name] = written
            self.computed[stage.name] = True
        return outputs

    def invalidate(self, name: str) -> None:
        """Drop a stage's marker so the next run recomputes it; stages
        depending on it recompute automatically (dirty cascade in run())."""
        _, _, marker = self._paths(name)
        if os.path.exists(marker):
            os.remove(marker)


def kg_stages(sf_dir: str, config) -> list[Stage]:
    """The flagship staged DAG: transcripts -> annotations -> triples."""
    from nlp_lib_spark.operators.extract import (annotate_turns,
                                                 triples_from_annotations)
    from nlp_lib_spark.operators.transcripts import transcripts

    def s_transcripts(spark, _):
        return transcripts(spark, sf_dir)

    def s_annotations(spark, outs):
        return annotate_turns(outs["transcripts"], config)

    def s_triples(spark, outs):
        # derive from the checkpointed annotations (pairs precomputed) —
        # a resume after the annotations stage never re-runs the
        # expensive chain, it reads the stage table
        return triples_from_annotations(outs["annotations"])

    return [Stage("transcripts", s_transcripts),
            Stage("annotations", s_annotations, deps=("transcripts",),
                  required_cols=("pairs",)),
            Stage("triples", s_triples, deps=("annotations",))]


def full_kg_stages(sf_dir: str, config, dictionary: tuple[str, ...],
                   lll_config=None) -> list[Stage]:
    """The complete KG-construction DAG (SURVEY.md §7 stage list):

    transcripts -> annotations -> triples -> discourse -> hor_edges
    -> entity canonical map -> nodes + edges. Every stage checkpoints with
    per-partition lineage, so a kill anywhere resumes exactly.

    ``lll_config`` (an ``operators.lll.LLLConfig``) additionally appends
    the legacy-LLL engine as an ``lll_triples`` stage off the checkpointed
    transcripts — at scale all engines share the one transcripts scan.
    """
    from pyspark.sql import functions as F

    from nlp_lib_spark.operators.discourse import (discourse_relations,
                                                   hor_edges)
    from nlp_lib_spark.operators.extract import mentions_from_annotations
    from nlp_lib_spark.operators.graph import canonical_map, materialize_graph

    def s_discourse(spark, outs):
        return discourse_relations(outs["annotations"])

    def s_hor(spark, outs):
        return hor_edges(outs["discourse"], outs["triples"])

    def s_cmap(spark, outs):
        mentions = mentions_from_annotations(outs["annotations"])
        ddf = spark.createDataFrame([(e,) for e in dictionary],
                                    "entity string")
        return canonical_map(mentions, ddf)

    def s_nodes(spark, outs):
        nodes, _edges = materialize_graph(outs["triples"], outs["cmap"])
        return nodes

    def s_edges(spark, outs):
        _nodes, edges = materialize_graph(outs["triples"], outs["cmap"])
        return edges.withColumn("weight", F.col("weight").cast("long"))

    stages = kg_stages(sf_dir, config) + [
        Stage("discourse", s_discourse, deps=("annotations",)),
        Stage("hor_edges", s_hor, deps=("discourse", "triples")),
        Stage("cmap", s_cmap, deps=("annotations",)),
        Stage("nodes", s_nodes, deps=("triples", "cmap")),
        Stage("edges", s_edges, deps=("triples", "cmap")),
    ]
    if lll_config is not None:
        from nlp_lib_spark.operators.lll import extract_triples_lll

        def s_lll(spark, outs):
            return extract_triples_lll(outs["transcripts"], lll_config)

        stages.append(Stage("lll_triples", s_lll, deps=("transcripts",)))
    return stages
