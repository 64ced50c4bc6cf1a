"""End-to-end index lifecycle: full build, resumable build, incremental update.

Mirrors the reference's ``Library::update_library`` flow
(/root/reference/src/library.rs:1000-1093, traced in SURVEY.md §3.2):

  1. scan existing analyzed rows at the current version   -> manifest read
  2. optional delete of vanished paths (set difference)   -> anti-join
  3. skip already-analyzed (set difference)               -> anti-join on
                                                             (doc_id, sha256)
  4. refuse mixed versions                                -> analyzer_version
                                                             sanity check
                                                             (src/library.rs:708-735)
  5. analyze the remainder, store failures separately     -> tokenize delta,
                                                             _errors ledger
  6. transactional store                                  -> snapshot commit

Resumability: the expensive stage (tokenization) checkpoints its output per
batch; a restarted build anti-joins against the checkpoint and only processes
missing docs, then derives the final index from checkpoint rows — so a build
killed at any point re-runs to an identical snapshot (tested byte-identical
for packed blocks).

Metrics (ST3 analogue — the reference's per-song progress counters,
src/library.rs:1204-1287): docs/sec, postings/sec, and per-stage skew ratio
(max partition key count / mean), recorded into the snapshot's metrics.json.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import with_invariants
from bliss_rs_spark.operators.build_index import (
    build_doc_stats,
    build_postings,
    build_term_stats,
    split_errors,
    tokenize_documents,
)
from bliss_rs_spark.operators.pack import build_packed_index_full
from bliss_rs_spark.sources.index_store import IndexStore



def _skew_ratio(df: DataFrame, key: str, weight: str | None = None) -> float:
    """max/mean rows (or summed weight) per key — the per-shuffle-stage skew
    metric.  Callers pass an already-aggregated frame (term_stats, packed)
    so this never re-scans the postings; it is a job over vocab-sized data."""
    agg = F.sum(weight) if weight else F.count(F.lit(1))
    counts = df.groupBy(key).agg(agg.alias("w"))
    row = counts.agg(F.max("w").alias("mx"), F.avg("w").alias("mean")).collect()[0]
    if not row["mean"]:
        return 1.0
    return float(row["mx"]) / float(row["mean"])


def _tokenize_with_checkpoint(
    spark: SparkSession, docs: DataFrame, store: IndexStore, cfg: IndexConfig
) -> DataFrame:
    """Tokenize only docs absent from the checkpoint; append; return the
    checkpointed rows restricted to the incoming doc set (J3 anti-join —
    THE resumability move, src/library.rs:1068-1071)."""
    ckpt = store.load_checkpoint(spark)
    if ckpt is not None:
        done = ckpt.filter(F.col("analyzer_version") == cfg.analyzer_version).select(
            "doc_id", "content_sha256"
        )
        todo = docs.join(done, ["doc_id", "content_sha256"], "left_anti")
    else:
        todo = docs
    if todo.limit(1).count() > 0:
        tokenized = tokenize_documents(todo, cfg).withColumn(
            "analyzer_version", F.lit(cfg.analyzer_version)
        )
        store.append_checkpoint(tokenized)
    ckpt = store.load_checkpoint(spark)
    # restrict to the incoming corpus (checkpoint may hold rows from docs
    # that have since vanished) and to the current analyzer version
    return ckpt.filter(F.col("analyzer_version") == cfg.analyzer_version).join(
        docs.select("doc_id", "content_sha256"), ["doc_id", "content_sha256"], "left_semi"
    )


def _assemble_and_commit(
    spark: SparkSession,
    tokenized: DataFrame,
    store: IndexStore,
    cfg: IndexConfig,
    prior_errors: DataFrame | None,
    t_start: float,
    docs_processed: int,
) -> str:
    # NOTE: no .cache() on the tokenized rows — they carry big string arrays,
    # and materializing those into the block-manager from 32 concurrent tasks
    # contends badly (measured 2.5x slowdown).  When checkpointing is on the
    # rows already live in parquet; the two downstream scans (doc_stats,
    # postings) each prune to the columns they need.
    ok, errors = split_errors(tokenized)
    if prior_errors is not None:
        errors = prior_errors.unionByName(errors)

    doc_stats = build_doc_stats(ok)
    stats_row = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n"]), float(stats_row["avgdl"] or 0.0)

    postings = build_postings(ok, cfg)
    term_stats = build_term_stats(postings, n_docs).cache()
    # n_postings and bucket skew both come from the tiny term_stats frame —
    # never a second full postings scan just for metrics
    agg = term_stats.agg(F.sum("df").alias("np")).collect()[0]
    n_postings = int(agg["np"] or 0)
    packed, doc_map = build_packed_index_full(postings, term_stats, n_docs, avgdl, cfg)

    positional = None
    if cfg.store_positions:
        from bliss_rs_spark.operators.phrase import build_positional_postings

        positional = build_positional_postings(ok, cfg)

    manifest = doc_stats.select(
        "doc_id",
        "content_sha256",
        F.lit(cfg.analyzer_version).alias("analyzer_version"),
        F.lit("ok").alias("status"),
    ).unionByName(
        errors.select(
            "doc_id",
            F.lit(None).cast("string").alias("content_sha256"),
            F.lit(cfg.analyzer_version).alias("analyzer_version"),
            F.lit("failed").alias("status"),
        )
    )

    elapsed = max(time.perf_counter() - t_start, 1e-9)
    metrics = {
        "docs_processed": docs_processed,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(docs_processed / elapsed, 2),
        "postings_per_sec": round(n_postings / elapsed, 2),
        "skew_ratio_term_bucket": round(
            _skew_ratio(term_stats, "term_bucket", weight="df"), 3
        ),
    }
    meta = {
        "config": __import__("json").loads(cfg.to_json()),
        "n_docs": n_docs,
        "avgdl": avgdl,
        "analyzer_version": cfg.analyzer_version,
        "index_format_version": cfg.index_format_version,
    }
    name = store.commit_snapshot(
        {
            "doc_stats": doc_stats,
            "postings": postings,
            "term_stats": term_stats,
            "packed": packed,
            "manifest": manifest,
            "errors": errors,
            **({"doc_map": doc_map} if doc_map is not None else {}),
            **({"positional": positional} if positional is not None else {}),
        },
        meta,
        metrics,
    )
    return name


def build_full(
    spark: SparkSession,
    docs: DataFrame,
    store: IndexStore,
    cfg: IndexConfig | None = None,
    checkpoint: bool = True,
) -> str:
    """Full (re)build; with checkpoint=True a killed build resumes for free."""
    cfg = cfg or IndexConfig()
    t0 = time.perf_counter()
    if "doc_id" not in docs.columns or "content_sha256" not in docs.columns:
        docs = with_invariants(docs)
    n_in = docs.count()
    if checkpoint:
        tokenized = _tokenize_with_checkpoint(spark, docs, store, cfg)
    else:
        tokenized = tokenize_documents(docs, cfg)
    return _assemble_and_commit(spark, tokenized, store, cfg, None, t0, n_in)


def update_index(
    spark: SparkSession,
    incoming: DataFrame,
    store: IndexStore,
    cfg: IndexConfig | None = None,
    delete_missing: bool = False,
) -> str:
    """Incremental update: tokenize only new/changed docs, carry everything
    else forward from the current snapshot, commit a new snapshot.

    With cfg=None the update inherits the INDEX's persisted config — layout
    options like store_positions/ordinal_docids are properties of the store,
    and silently changing them mid-stream would drop frames (the
    FeaturesVersion don't-mix principle applied to physical layout).
    """
    t0 = time.perf_counter()
    if store.current_snapshot() is None:
        return build_full(spark, incoming, store, cfg or IndexConfig())
    cfg = cfg or store.config()

    meta = store.meta()
    if meta["analyzer_version"] != cfg.analyzer_version:
        # mixed-version stores are refused, exactly like the reference's
        # version sanity check (/root/reference/src/library.rs:708-735);
        # callers re-run build_full after clearing checkpoints to migrate.
        raise ValueError(
            f"index built with analyzer_version={meta['analyzer_version']}, "
            f"config says {cfg.analyzer_version}: refusing to mix; run build_full"
        )

    if "doc_id" not in incoming.columns or "content_sha256" not in incoming.columns:
        incoming = with_invariants(incoming)
    incoming = incoming.cache()

    manifest = store.load(spark, "manifest")
    done_ok = manifest.filter(
        (F.col("status") == "ok")
        & (F.col("analyzer_version") == cfg.analyzer_version)
    ).select("doc_id", "content_sha256")

    # 3. skip-already-analyzed: new or content-changed docs only
    delta = incoming.join(done_ok, ["doc_id", "content_sha256"], "left_anti").cache()
    n_delta = delta.count()

    # 2. vanished docs: indexed but absent from the incoming corpus
    if delete_missing:
        keep_ids = done_ok.join(
            incoming.select("doc_id"), "doc_id", "left_semi"
        )
    else:
        keep_ids = done_ok
    # docs whose content changed must drop their old rows too (upsert:
    # delete+reinsert, src/library.rs:1544-1633)
    keep_ids = keep_ids.join(delta.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id"
    )

    new_tokenized = tokenize_documents(delta, cfg)
    new_ok, new_errors = split_errors(new_tokenized)

    old_doc_stats = store.load(spark, "doc_stats").join(keep_ids, "doc_id", "left_semi")
    old_postings = store.load(spark, "postings").join(keep_ids, "doc_id", "left_semi")
    prior_errors = store.load(spark, "errors").join(
        delta.select("doc_id"), "doc_id", "left_anti"
    )

    new_doc_stats = build_doc_stats(new_ok)
    doc_stats = old_doc_stats.unionByName(new_doc_stats).cache()
    stats_row = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n"]), float(stats_row["avgdl"] or 0.0)

    postings = old_postings.unionByName(build_postings(new_ok, cfg))
    term_stats = build_term_stats(postings, n_docs).cache()
    n_postings = int(term_stats.agg(F.sum("df")).collect()[0][0] or 0)
    packed, doc_map = build_packed_index_full(postings, term_stats, n_docs, avgdl, cfg)

    positional = None
    if cfg.store_positions:
        from bliss_rs_spark.operators.phrase import build_positional_postings

        old_positional = store.load(spark, "positional").join(
            keep_ids, "doc_id", "left_semi"
        )
        positional = old_positional.unionByName(build_positional_postings(new_ok, cfg))

    errors = prior_errors.unionByName(
        new_errors
    )
    manifest_out = doc_stats.select(
        "doc_id",
        "content_sha256",
        F.lit(cfg.analyzer_version).alias("analyzer_version"),
        F.lit("ok").alias("status"),
    ).unionByName(
        errors.select(
            "doc_id",
            F.lit(None).cast("string").alias("content_sha256"),
            F.lit(cfg.analyzer_version).alias("analyzer_version"),
            F.lit("failed").alias("status"),
        )
    )

    elapsed = max(time.perf_counter() - t0, 1e-9)
    metrics = {
        "docs_processed": n_delta,
        "docs_skipped": int(incoming.count()) - n_delta,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n_delta / elapsed, 2),
        "postings_per_sec": round(n_postings / elapsed, 2),
        "skew_ratio_term_bucket": round(_skew_ratio(term_stats, "term_bucket", weight="df"), 3),
    }
    meta_out = dict(
        meta,
        n_docs=n_docs,
        avgdl=avgdl,
        config=__import__("json").loads(cfg.to_json()),  # the cfg actually used
    )
    return store.commit_snapshot(
        {
            "doc_stats": doc_stats,
            "postings": postings,
            "term_stats": term_stats,
            "packed": packed,
            "manifest": manifest_out,
            "errors": errors,
            **({"doc_map": doc_map} if doc_map is not None else {}),
            **({"positional": positional} if positional is not None else {}),
        },
        meta_out,
        metrics,
    )


def query_index(
    spark: SparkSession,
    store: IndexStore,
    query_text: str,
    k: int = 10,
    use_wand: bool = True,
) -> DataFrame:
    """Answer a query from the CURRENT snapshot (WAND or exhaustive)."""
    meta = store.meta()
    cfg = store.config()
    term_stats = store.load(spark, "term_stats")
    if use_wand:
        from bliss_rs_spark.operators.wand import wand_topk

        packed = store.load(spark, "packed")
        doc_map = store.load(spark, "doc_map") if cfg.ordinal_docids else None
        return wand_topk(
            spark, packed, term_stats, meta["avgdl"], query_text, k, cfg,
            doc_map=doc_map,
        )
    from bliss_rs_spark.operators.bm25 import bm25_topk

    postings = store.load(spark, "postings")
    return bm25_topk(spark, postings, term_stats, meta["avgdl"], query_text, k, cfg)


def phrase_query(
    spark: SparkSession,
    store: IndexStore,
    phrase: str,
    k: int = 10,
) -> DataFrame:
    """Exact-phrase top-k from the CURRENT snapshot's positional postings
    (requires the index to have been built with cfg.store_positions)."""
    cfg = store.config()
    if not cfg.store_positions:
        raise ValueError(
            "index was built without positions; rebuild with "
            "IndexConfig(store_positions=True) to run phrase queries"
        )
    from bliss_rs_spark.operators.phrase import phrase_topk

    positional = store.load(spark, "positional")
    return phrase_topk(spark, positional, phrase, k, cfg)
