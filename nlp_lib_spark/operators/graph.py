"""KG materialization: canonical node/edge tables.

Final stage of the north rule: triples + mention links + components ->
``nodes(entity_id, canonical, n_aliases, n_mentions)`` and
``edges(subj_id, pred, obj_id, weight, n_convs)``. In production both are
Iceberg tables partitioned by ``bucket(N, subj_id)`` (see sources/catalog);
here parquet. The canonicalization map is usually small relative to the
triple stream -> broadcast it into the triple rewrite so the only wide
shuffle is the final edge aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nlp_lib_spark.operators.canonicalize import components_with_singletons
from nlp_lib_spark.operators.linking import link_edges_for_cc, link_mentions


def canonical_map(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """mention norm -> canonical entity id (component min-label).

    The mention stream is consumed by several joins and the CC loop —
    localCheckpoint it once so the upstream Arrow annotation chain runs
    exactly once, not once per consumer.
    """
    mentions = mentions.localCheckpoint()
    linked = link_mentions(mentions, dictionary).localCheckpoint()
    edges = link_edges_for_cc(linked)
    verts = (linked.select(F.col("norm").alias("id"))
             .union(linked.select(F.col("entity").alias("id")))
             .distinct())
    comp = components_with_singletons(edges, verts)
    return (linked.select("norm", "entity", "method", "score").distinct()
            .join(comp, linked.norm == comp.id)
            .select("norm", F.col("component").alias("entity_id"),
                    "method", "score"))


def materialize_graph(triples: DataFrame, cmap: DataFrame
                      ) -> tuple[DataFrame, DataFrame]:
    """Returns (nodes, edges) with canonical ids."""
    cm = F.broadcast(cmap.select("norm", "entity_id").distinct())
    t = (triples
         .withColumn("subj_norm", F.expr(
             "trim(regexp_replace(lower(subj), '\\\\s+', ' '))"))
         .withColumn("obj_norm", F.expr(
             "trim(regexp_replace(lower(obj), '\\\\s+', ' '))")))
    t = (t.join(cm.withColumnRenamed("norm", "subj_norm")
                  .withColumnRenamed("entity_id", "subj_id"),
                "subj_norm", "left")
          .join(cm.withColumnRenamed("norm", "obj_norm")
                  .withColumnRenamed("entity_id", "obj_id"),
                "obj_norm", "left")
          .withColumn("subj_id", F.coalesce("subj_id", "subj_norm"))
          .withColumn("obj_id", F.coalesce("obj_id", "obj_norm"))
          .localCheckpoint())  # consumed by both nodes and edges aggs

    edges = (t.groupBy("subj_id", "pred", "obj_id")
             .agg(F.count(F.lit(1)).alias("weight"),
                  F.countDistinct("conv_id").alias("n_convs")))
    nodes = (t.select(F.col("subj_id").alias("entity_id"),
                      F.col("subj_norm").alias("alias"))
             .union(t.select(F.col("obj_id"), F.col("obj_norm")))
             .groupBy("entity_id")
             .agg(F.countDistinct("alias").alias("n_aliases"),
                  F.count(F.lit(1)).alias("n_mentions")))
    return nodes, edges


def write_graph(nodes: DataFrame, edges: DataFrame, out_dir: str,
                buckets: int = 64) -> None:
    """Parquet sink (Iceberg ``bucket(subj_id)`` in production)."""
    (nodes.repartition(buckets, "entity_id")
     .write.mode("overwrite").parquet(f"{out_dir}/nodes"))
    (edges.repartition(buckets, "subj_id")
     .write.mode("overwrite").parquet(f"{out_dir}/edges"))
