"""Entity linking + connected-components canonicalization."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from nlp_lib_spark.operators.canonicalize import (components_with_singletons,
                                                  connected_components)
from nlp_lib_spark.operators.graph import canonical_map, materialize_graph
from nlp_lib_spark.operators.linking import link_mentions


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def test_cc_matches_union_find_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["u", "v"]))
    got = {r.id: r.component
           for r in connected_components(e).collect()}
    # expected: min-label components via union-find
    exp = _uf_components(edges)
    # min-label: relabel each union-find root to min member
    groups = {}
    for x, r in exp.items():
        groups.setdefault(r, []).append(x)
    exp_min = {}
    for members in groups.values():
        m = min(members)
        for x in members:
            exp_min[x] = m
    assert got == exp_min


def test_cc_singletons(spark):
    e = spark.createDataFrame(pd.DataFrame([("a", "b")], columns=["u", "v"]))
    verts = spark.createDataFrame(
        pd.DataFrame({"id": ["a", "b", "z"]}))
    got = {r.id: r.component
           for r in components_with_singletons(e, verts).collect()}
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_fuzzy_linking_merges_typo(spark):
    mentions = spark.createDataFrame(pd.DataFrame(
        {"mention_text": ["hash join", "hash joln", "spark", "zzz qqq"]}))
    dictionary = spark.createDataFrame(pd.DataFrame(
        {"entity": ["hash join", "spark"]}))
    linked = link_mentions(mentions, dictionary).toPandas()
    by_norm = {r.norm: (r.entity, r.method) for r in linked.itertuples()}
    assert by_norm["hash join"] == ("hash join", "exact")
    assert by_norm["hash joln"][0] == "hash join"
    assert by_norm["hash joln"][1] == "jaccard3"
    assert by_norm["spark"] == ("spark", "exact")
    assert by_norm["zzz qqq"][1] == "unlinked"


def test_tfidf_linking_tiers_and_exact_score(spark):
    """IDF-weighted tier: hand-checked score arithmetic (integer sums +
    one BIGINT floor division — must equal the pure-Python rational)."""
    import math

    from nlp_lib_spark.operators.linking import (gram_idf_weights,
                                                 link_mentions_tfidf,
                                                 _py_grams)
    ents = ("hash join", "table scan", "spark")
    mentions = spark.createDataFrame(pd.DataFrame(
        {"mention_text": ["spark", "join", "zzz qqq", "a"]}))
    dictionary = spark.createDataFrame(pd.DataFrame({"entity": list(ents)}))
    got = {r.norm: (r.entity, r.method, r.score_micro)
           for r in link_mentions_tfidf(mentions, dictionary,
                                        threshold_micro=200_000).collect()}
    assert got["spark"] == ("spark", "exact", 1_000_000)
    assert got["zzz qqq"][1] == "unlinked" and got["zzz qqq"][2] == 0
    assert got["a"][1] == "unlinked"
    ent, method, score = got["join"]
    assert (ent, method) == ("hash join", "tfidf3")
    # independent recomputation of the floor-division score
    weights, w_oov = gram_idf_weights(ents)
    a = sum(weights.get(g, w_oov) for g in _py_grams("join"))
    b = sum(weights[g] for g in _py_grams("hash join"))
    inter = sum(weights[g] for g in set(_py_grams("join"))
                & set(_py_grams("hash join")))
    assert score == (inter * 1_000_000) // (a + b - inter)
    # weight table construction invariants
    n = len(set(ents))
    assert w_oov == int(round(1e6 * math.log((n + 1) / 0.5)))
    assert all(w >= 1 for w in weights.values())


def test_tfidf_rare_gram_dominates(spark):
    """The discriminative (rare) gram must outvote ubiquitous ones: a
    mention sharing one rare gram with A scores higher against A than a
    mention sharing one everywhere-gram scores against anything."""
    from nlp_lib_spark.operators.linking import (gram_idf_weights,
                                                 _py_grams)
    ents = ("alpha common", "beta common", "gamma common", "delta zebraq")
    weights, _ = gram_idf_weights(ents)
    # "omm" appears in 3 of 4 entities; "ebr" only in one
    assert weights["ebr"] > weights["omm"]


def test_canonical_map_and_graph(spark):
    mentions = spark.createDataFrame(pd.DataFrame(
        {"mention_text": ["Hash Join", "hash joln", "spark"]}))
    dictionary = spark.createDataFrame(pd.DataFrame(
        {"entity": ["hash join", "spark"]}))
    cmap = canonical_map(mentions, dictionary).toPandas()
    ids = {r.norm: r.entity_id for r in cmap.itertuples()}
    # typo and exact both canonicalize to the same component id
    assert ids["hash join"] == ids["hash joln"] == "hash join"

    triples = spark.createDataFrame(pd.DataFrame(
        [("c1", 0, 0, 1, 2, "Hash Join", "binds", "spark"),
         ("c1", 1, 0, 1, 2, "hash joln", "binds", "spark")],
        columns=["conv_id", "turn_idx", "sent_id", "e1", "e2",
                 "subj", "pred", "obj"]))
    cmap_df = canonical_map(mentions, dictionary)
    nodes, edges = materialize_graph(triples, cmap_df)
    ep = edges.toPandas()
    # the two surface variants collapse into ONE canonical edge, weight 2
    assert len(ep) == 1
    assert ep.iloc[0].weight == 2 and ep.iloc[0].subj_id == "hash join"


def test_colliding_dictionary_norms_one_verdict_per_norm(spark):
    """Two raw dictionary entries that normalize identically ('US'/'us')
    must produce exactly ONE exact-tier verdict per mention norm, with
    the min-entity tiebreak — not duplicate rows (review finding)."""
    from nlp_lib_spark.operators.linking import (link_mentions,
                                                 link_mentions_tfidf)
    mentions = spark.createDataFrame(pd.DataFrame(
        {"mention_text": ["us", "US", "the us"]}))
    dictionary = spark.createDataFrame(pd.DataFrame(
        {"entity": ["US", "us", "the  US"]}))
    # link_mentions keeps one row per input MENTION row
    lp = link_mentions(mentions, dictionary).toPandas()
    assert (lp.groupby("mention_text").size() == 1).all(), lp
    assert set(lp.entity) == {"US", "the  US"}   # min('US', 'us') == 'US'
    assert set(lp.method) == {"exact"}
    # link_mentions_tfidf dedups to one verdict per distinct NORM
    tp = link_mentions_tfidf(mentions, dictionary).toPandas()
    assert (tp.groupby("norm").size() == 1).all(), tp
    by = {r.norm: (r.entity, r.method) for r in tp.itertuples()}
    assert by["us"] == ("US", "exact")
    assert by["the us"] == ("the  US", "exact")


def test_cc_tolerates_null_and_self_edges(spark):
    """A null endpoint or self-loop must be dropped, not crash the
    per-partition union-find worker (review finding)."""
    edges = spark.createDataFrame(pd.DataFrame(
        [("a", "b"), (None, "x"), ("y", None), ("c", "c"), ("b", "c")],
        columns=["u", "v"]))
    comp = connected_components(edges).toPandas()
    labels = {r.id: r.component for r in comp.itertuples()}
    assert labels == {"a": "a", "b": "a", "c": "a"}


def test_cc_frees_superseded_checkpoints(spark):
    """DataFrame.unpersist() is a no-op after localCheckpoint, so CC must
    drop superseded rounds at the RDD layer: after a multi-round run, at
    most ONE checkpoint (the final edge state) may remain resident
    beyond what was persisted before the call (review finding)."""
    from nlp_lib_spark.operators.canonicalize import _persistent_ids
    sc = spark.sparkContext
    # long path graph -> several star rounds even after local contraction
    n = 200
    edges = spark.createDataFrame(pd.DataFrame(
        [(f"v{i:04d}", f"v{i+1:04d}") for i in range(n)],
        columns=["u", "v"])).repartition(8)
    before = _persistent_ids(sc)
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1
    leaked = _persistent_ids(sc) - before
    assert len(leaked) <= 1, leaked


def test_tfidf_dictionary_contract_enforced(spark, monkeypatch):
    """link_mentions_tfidf fails fast (naming the distributed
    alternative) when the dictionary exceeds the broadcast-size
    contract, instead of silently collecting it onto the driver."""
    import pytest

    from nlp_lib_spark.operators import linking

    mentions = spark.createDataFrame([("spark",)], "mention_text string")
    dictionary = spark.createDataFrame(
        [(f"entity {i}",) for i in range(5)], "entity string")
    monkeypatch.setattr(linking, "MAX_DICT_ENTITIES", 3)
    with pytest.raises(ValueError, match="broadcast-size contract"):
        linking.link_mentions_tfidf(mentions, dictionary)
    # the named alternative handles the same over-contract dictionary
    # without any driver collect or MAX_DICT_ENTITIES dependence
    out = linking.link_mentions_tfidf_distributed(
        mentions, dictionary).collect()
    assert {r.method for r in out} <= {"exact", "tfidf3", "unlinked"}
    # within the contract the same call succeeds
    monkeypatch.setattr(linking, "MAX_DICT_ENTITIES", 1000)
    out = linking.link_mentions_tfidf(mentions, dictionary).collect()
    assert {r.method for r in out} <= {"exact", "tfidf3", "unlinked"}


def test_tfidf_distributed_matches_broadcast(spark):
    """The beyond-broadcast-scale variant must reproduce the broadcast
    tier's verdicts BIT-FOR-BIT at its default (exact) setting — same
    entities, same methods, same integer micro-scores — across every
    verdict class (exact hit, fuzzy hit, norm-collision dedup, short
    <3-char mention, unlinked)."""
    from nlp_lib_spark.operators.linking import (
        link_mentions_tfidf, link_mentions_tfidf_distributed)
    ents = ["hash join", "table scan", "spark", "shuffle spill",
            "broadcast exchange", "US", "us", "row group"]
    mentions = spark.createDataFrame(pd.DataFrame({"mention_text": [
        "spark", "Spark", "join", "tble scan", "shuffle  spill",
        "broadcast exchang", "zzz qqq", "a", "US", "row gruop"]}))
    dictionary = spark.createDataFrame(pd.DataFrame({"entity": ents}))
    key = ["norm", "entity", "method", "score_micro"]
    bc = (link_mentions_tfidf(mentions, dictionary,
                              threshold_micro=200_000)
          .toPandas().sort_values(key).reset_index(drop=True))
    dist = (link_mentions_tfidf_distributed(mentions, dictionary,
                                            threshold_micro=200_000)
            .toPandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(bc[key], dist[key])
    assert set(bc.method) == {"exact", "tfidf3", "unlinked"}


def test_tfidf_distributed_stop_gram_cap(spark):
    """max_gram_df_frac drops ubiquitous grams from BOTH sides: verdicts
    stay one-per-norm with exact hits untouched, and a mention whose only
    shared grams are the capped-out ubiquitous ones goes unlinked."""
    from nlp_lib_spark.operators.linking import (
        link_mentions_tfidf_distributed)
    # "common" appears in every entity -> its grams df == N get capped;
    # each entity's distinctive head word survives
    ents = [f"{w} common" for w in
            ("alpha", "beta", "gamma", "delta", "zebraq")]
    mentions = spark.createDataFrame(pd.DataFrame({"mention_text": [
        "zebraq common",   # exact
        "zebrak common",   # fuzzy via the rare "zeb"/"ebr" grams
        "wommon",          # shares only capped "common" grams
    ]}))
    dictionary = spark.createDataFrame(pd.DataFrame({"entity": ents}))
    out = {r.norm: (r.entity, r.method)
           for r in link_mentions_tfidf_distributed(
               mentions, dictionary, threshold_micro=100_000,
               max_gram_df_frac=0.5).collect()}
    assert len(out) == 3  # one verdict per norm
    assert out["zebraq common"] == ("zebraq common", "exact")
    assert out["zebrak common"] == ("zebraq common", "tfidf3")
    assert out["wommon"][1] == "unlinked"
