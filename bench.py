"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Timed stages:
  index_build      tokenize -> postings -> term/doc stats (actions forced)
  bm25_batch       5-query reference-style set, batched exhaustive BM25
  minhash_lsh      MinHash+LSH near-dup pairs over documents
  simhash          64-bit SimHash fingerprints
  cosine_topk      brute-force cosine top-10 over embeddings
  quality          per-doc quality metrics (JVM expressions)

Also reports docs_per_sec for the build (the reference's headline metric is
files/sec: ~3.0 files/sec for 10k files, /root/reference/README.md:158-160).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from bliss_rs_spark.config import IndexConfig
    from bliss_rs_spark.corpus import documents_from_testdata
    from bliss_rs_spark.operators.bm25 import bm25_topk_batch
    from bliss_rs_spark.operators.build_index import build_index_frames
    from bliss_rs_spark.operators.dedup import minhash_lsh_pairs, simhash64
    from bliss_rs_spark.operators.similarity import cosine_topk_by_id
    from bliss_rs_spark.functions.text_stats import with_quality
    from bliss_rs_spark.session import get_spark

    spark = get_spark("bliss_rs_spark_bench", cpus=cpus)
    cfg = IndexConfig()
    timings: dict[str, float] = {}

    docs = documents_from_testdata(spark, sf_dir).cache()
    n_docs = docs.count()  # warm the cache outside any timed window

    t0 = time.perf_counter()
    idx = build_index_frames(docs, cfg)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    n_postings = idx.postings.count()
    idx.term_stats.count()
    timings["index_build"] = time.perf_counter() - t0

    query_set = [
        (1, "spark hash join", 10),
        (2, "window merge sort", 10),
        (3, "fastScanBatch", 10),
        (4, "the a big small", 10),
        (5, "stream filter table", 100),
    ]
    t0 = time.perf_counter()
    bm25_topk_batch(spark, idx.postings, idx.term_stats, idx.avgdl, query_set, cfg).collect()
    timings["bm25_batch"] = time.perf_counter() - t0

    from bliss_rs_spark.operators.pack import build_packed_index_full
    from bliss_rs_spark.operators.wand import wand_topk_batch

    t0 = time.perf_counter()
    packed, doc_map = build_packed_index_full(
        idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg
    )
    packed = packed.cache()
    packed.count()
    if doc_map is not None:
        doc_map = doc_map.cache()
        doc_map.count()
    timings["pack_build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    wand_topk_batch(
        spark, packed, idx.term_stats, idx.avgdl, query_set, cfg, doc_map=doc_map
    ).collect()
    timings["wand_batch"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    minhash_lsh_pairs(docs, n_hashes=8, bands=4, jaccard_threshold=0.05).count()
    timings["minhash_lsh"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    simhash64(docs).count()
    timings["simhash"] = time.perf_counter() - t0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()
    t0 = time.perf_counter()
    cosine_topk_by_id(emb, 0, 10).collect()
    timings["cosine_topk"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    with_quality(docs, "content").agg(F.sum("n_tokens")).collect()
    timings["quality"] = time.perf_counter() - t0

    # --- low-latency serving: warm single-query p50 through WandServer ------
    from bliss_rs_spark.operators.wand import WandServer

    server = WandServer(spark, packed, idx.term_stats, idx.avgdl, cfg, doc_map)
    server.query("spark hash join", 10)  # warm-up, untimed
    lat = []
    for qtext in [
        "window merge sort", "fastScanBatch", "stream filter table",
        "spark hash join", "return value data",
    ]:
        t0 = time.perf_counter()
        server.query(qtext, 10)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    timings["wand_serve_p50"] = lat[len(lat) // 2]
    serve_single_stage = server.single_stage

    # --- snapshot build + 1%-delta incremental update ------------------------
    import tempfile

    from bliss_rs_spark.plans.lifecycle import build_full, update_index
    from bliss_rs_spark.sources.index_store import IndexStore

    store = IndexStore(tempfile.mkdtemp(prefix="bench_idx_") + "/idx")
    t0 = time.perf_counter()
    build_full(spark, docs, store, cfg, checkpoint=False)
    timings["snapshot_build"] = time.perf_counter() - t0

    changed = docs.withColumn(
        "content",
        F.when(
            F.col("doc_id") % 100 == 0,
            F.concat(F.col("content"), F.lit("\nzz_bench_delta zz_bench_delta")),
        ).otherwise(F.col("content")),
    ).withColumn("content_sha256", F.sha2("content", 256))
    t0 = time.perf_counter()
    update_index(spark, changed, store, cfg)
    timings["incremental_update"] = time.perf_counter() - t0
    with open(os.path.join(store.snapshot_dir(), "metrics.json")) as fh:
        upd = json.load(fh)

    changed2 = changed.withColumn(
        "content",
        F.when(
            F.col("doc_id") % 100 == 1,
            F.concat(F.col("content"), F.lit("\nzz_bench_seg zz_bench_seg")),
        ).otherwise(F.col("content")),
    ).withColumn("content_sha256", F.sha2("content", 256))
    t0 = time.perf_counter()
    update_index(spark, changed2, store, cfg, repack="segment")
    timings["incremental_update_segment"] = time.perf_counter() - t0
    with open(os.path.join(store.snapshot_dir(), "metrics.json")) as fh:
        upd_seg = json.load(fh)

    # same 1%-delta segment update on a CHECKPOINTED store: removed docs'
    # df/sum_dl decrements come from the tokenize checkpoint (no packed-unit
    # decode) — measuring both df_source paths side by side
    store2 = IndexStore(tempfile.mkdtemp(prefix="bench_idx_ck_") + "/idx")
    build_full(spark, docs, store2, cfg, checkpoint=True)
    t0 = time.perf_counter()
    update_index(spark, changed, store2, cfg, repack="segment")
    timings["incremental_update_segment_ckpt"] = time.perf_counter() - t0
    with open(os.path.join(store2.snapshot_dir(), "metrics.json")) as fh:
        upd_seg_ck = json.load(fh)

    # headline value = the round-1-comparable 8-stage suite; the lifecycle
    # stages (snapshot_build / updates / serving) are reported alongside
    CORE = (
        "index_build", "bm25_batch", "pack_build", "wand_batch",
        "minhash_lsh", "simhash", "cosine_topk", "quality",
    )
    total = sum(timings[k] for k in CORE)
    out = {
        "metric": "headline_suite_sec",
        "value": round(total, 3),
        "all_stages_sec": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "docs_per_sec_build": round(n_docs / timings["index_build"], 1),
        "cpus": cpus,
        "serve_single_stage": serve_single_stage,
        "update_docs_processed": upd["docs_processed"],
        "update_shards_repacked": upd["n_shards_repacked"],
        "update_shards_carried": upd["n_shards_carried"],
        "update_segment_docs_processed": upd_seg["docs_processed"],
        "update_segment_shards_repacked": upd_seg["n_shards_repacked"],
        "update_segment_df_source": upd_seg.get("df_source"),
        "update_segment_ckpt_df_source": upd_seg_ck.get("df_source"),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
