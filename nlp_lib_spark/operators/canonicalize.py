"""Entity canonicalization: iterative connected components over joins.

The reference links mentions only by exact dictionary membership
(``EntityLexicon``, main/WBioRelEx.java:420-476); the north rule extends
this to canonicalization as connected components over the mention-similarity
graph. This module implements CC as the alternating large-star/small-star
join algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond" — public literature), which converges in O(log^2 n) rounds and is
the standard shape for 10^12-edge graphs:

* both steps are groupBy-min + join — map-side partial aggregation absorbs
  hot vertices (skew), and AQE skew-join handles the join-side tail; an
  explicit salt is unnecessary for min() aggregates because partial combine
  already collapses the hot key per-partition (noted in SURVEY.md §4).
* each round localCheckpoints the edge set: truncates lineage so round k+1
  doesn't replay rounds 1..k (the loop-in-Spark anti-pattern).

Vertex ids are arbitrary orderable values (we use strings: normalized
mention surface forms); the component label is the MINIMUM member, which
makes results engine-comparable (DuckDB oracle = recursive-CTE closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Diagnostics from the most recent connected_components() call on this
# driver: {"rounds": star rounds run, "peak_persistent": max number of
# persistent RDDs observed after any round's checkpoint}. Written for the
# scale-rehearsal harness (scripts/dev_scale_rehearsal.py) — behavior is
# unaffected.
LAST_CC_STATS: dict = {}


def _symmetrize(edges: DataFrame) -> DataFrame:
    e = edges.select(F.col("u"), F.col("v")).filter(F.col("u") != F.col("v"))
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()


def _star(edges: DataFrame, large: bool) -> DataFrame:
    # m(u) = min over N(u) ∪ {u}.  No distinct here: duplicate edges
    # cannot change a min() aggregate, and the round-final symmetrize
    # dedups once — one shuffle per round instead of three.
    mins = (edges.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .withColumn("m", F.least(F.col("u"), F.col("mn")))
            .select("u", "m"))
    j = edges.join(mins, "u")
    if large:  # connect strictly-larger neighbors to m
        j = j.filter(F.col("v") > F.col("u"))
    else:      # small-star: connect smaller-or-equal neighbors to m
        j = j.filter(F.col("v") <= F.col("u"))
    return (j.select(F.col("v").alias("u"), F.col("m").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .union(mins.select(F.col("u"), F.col("m").alias("v"))
                    .filter(F.col("u") != F.col("v"))))


def _local_contract(edges: DataFrame) -> DataFrame:
    """Per-partition union-find contraction (one Arrow pass, no shuffle).

    Each partition's edge set is replaced by a star from every locally
    seen vertex to its partition-local min root — this preserves global
    connectivity exactly while collapsing |E| to at most the number of
    distinct vertices per partition, so the global star rounds start
    from a near-contracted graph and converge in 1-2 iterations instead
    of O(log^2).  Memory is bounded by vertices-per-partition: at scale,
    size ``spark.sql.files.maxPartitionBytes`` / repartition accordingly.
    """
    import pandas as pd

    def fn(batches):
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for u, v in zip(pdf["u"], pdf["v"]):
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
        yield pd.DataFrame([(n, find(n)) for n in parent],
                           columns=["u", "v"])

    return (edges.mapInPandas(fn, schema="u string, v string")
            .filter(F.col("u") != F.col("v")))


def _sig(e: DataFrame) -> tuple:
    row = e.select(F.expr("bit_xor(xxhash64(u, v))").alias("s"),
                   F.count(F.lit(1)).alias("n")).collect()[0]
    return (row.s, row.n)


def _persistent_ids(sc) -> set:
    m = sc._jsc.sc().getPersistentRDDs()
    it, ids = m.iterator(), set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def _unpersist_rdd_ids(sc, ids: set) -> None:
    """Free localCheckpoint blocks by RDD id.

    ``DataFrame.unpersist()`` is a NO-OP for localCheckpoint'd frames
    (verified on PySpark 4.1.2: it only uncaches CacheManager entries,
    while the checkpoint persists the internal RDD directly), so a
    superseded round must be dropped at the RDD layer — otherwise every
    round's blocks stay resident until nondeterministic GC, which is
    exactly the executor-memory pressure a k-round CC over a large graph
    cannot afford."""
    m = sc._jsc.sc().getPersistentRDDs()
    it = m.iterator()
    while it.hasNext():
        t = it.next()
        if t._1() in ids:
            t._2().unpersist(False)


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(u, v) -> (id, component) with component = min member id.

    Raises ``RuntimeError`` if the star rounds have not reached the
    signature fixpoint within ``max_iter`` iterations: labels derived
    from a non-converged edge set can split one true component into
    several, and a silently-wrong canonical map is strictly worse than a
    loud failure. Kiveris-style alternation needs O(log^2 n) rounds in
    the worst case and 1-3 in practice after local contraction, so 50 is
    far above anything a real graph requires.
    """
    sc = edges.sparkSession.sparkContext
    # dirty-edge guard: a null endpoint would crash the union-find
    # worker ('<' between str and None); self-loops carry no information
    clean = edges.select("u", "v").filter(
        F.col("u").isNotNull() & F.col("v").isNotNull()
        & (F.col("u") != F.col("v")))
    pre = _persistent_ids(sc)
    e = _symmetrize(_local_contract(clean)).localCheckpoint()
    own = _persistent_ids(sc) - pre
    # seed with the contracted state's signature: when local contraction
    # already reached the fixpoint (common — few input partitions), the
    # first star round detects stability immediately instead of paying a
    # second confirmation round
    prev_sig = _sig(e)
    converged = False
    rounds = 0
    peak_persistent = len(_persistent_ids(sc))
    for _ in range(max_iter):
        prev_ids = own
        nxt = _star(_star(e, large=True), large=False)
        pre = _persistent_ids(sc)
        e = _symmetrize(nxt).localCheckpoint()  # eager: blocks exist now
        own = _persistent_ids(sc) - pre
        peak_persistent = max(peak_persistent, len(_persistent_ids(sc)))
        _unpersist_rdd_ids(sc, prev_ids)  # superseded round's blocks
        rounds += 1
        sig = _sig(e)
        if prev_sig == sig:
            converged = True
            break
        prev_sig = sig
    LAST_CC_STATS.clear()
    LAST_CC_STATS.update({"rounds": rounds,
                          "peak_persistent": peak_persistent})
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} star "
            "rounds — refusing to emit possibly-split component labels")
    comp = (e.groupBy("u").agg(F.min("v").alias("mn"))
            .select(F.col("u").alias("id"),
                    F.least(F.col("u"), F.col("mn")).alias("component")))
    return comp


def components_with_singletons(edges: DataFrame,
                               vertices: DataFrame) -> DataFrame:
    """Attach isolated vertices (component = themselves)."""
    comp = connected_components(edges)
    return (vertices.select(F.col("id"))
            .join(comp, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component")))
