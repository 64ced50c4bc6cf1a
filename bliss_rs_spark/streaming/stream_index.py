"""Structured Streaming index maintenance: document batches -> index snapshots.

The reference is a batch engine whose descriptors are nonetheless streaming
accumulators (``do_``/``get_value`` pairs; all but chroma can stream,
/root/reference/src/song/mod.rs:381-387) and whose update path is re-run on
deltas (src/library.rs:1000-1093).  Spark-native equivalent: a file-source
stream of document batches feeding ``foreachBatch(update_index)`` — each
micro-batch lands as one atomic snapshot, and the manifest anti-join inside
update_index makes redelivered batches idempotent (effectively-once sink).

Also provides a windowed ingest-rate monitor over the ``events`` table shape,
the progress-telemetry analogue (src/library.rs:1204-1287).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.sources.index_store import IndexStore

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def stream_documents_to_index(
    spark: SparkSession,
    input_dir: str,
    store: IndexStore,
    cfg: IndexConfig | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 4,
):
    """Start a file-source stream over ``input_dir`` (parquet document
    batches); every micro-batch upserts into the index store.  Returns the
    StreamingQuery (caller drives with processAllAvailable/stop in tests,
    trigger(availableNow=True) in jobs)."""
    # cfg stays None unless the caller overrides: update_index inherits the
    # STORE's persisted config (layout options like lang_tagging /
    # store_positions are properties of the index — defaulting to a fresh
    # IndexConfig() here would silently mix tagged/untagged postings and drop
    # positional/doc_map frames from subsequent snapshots).  The first-build
    # path inside update_index defaults to IndexConfig() on its own.
    incoming = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from bliss_rs_spark.plans.lifecycle import update_index

        if batch_df.isEmpty():
            return
        # segment repack: each micro-batch appends one delta-sized segment
        # pack and hard-links the whole base — O(batch) writes per trigger.
        # update_index's auto-maintenance ladder (plans.lifecycle.maintain)
        # bounds unit fan-out and tombstone churn, so a long-running stream
        # self-compacts instead of accreting units until someone remembers.
        update_index(batch_df.sparkSession, batch_df, store, cfg, repack="segment")

    writer = incoming.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def running_user_stats(
    spark: SparkSession,
    events_dir: str,
):
    """Custom stateful streaming operator: per-user running totals maintained
    in applyInPandasWithState across micro-batches (ST1 parity: the
    reference's descriptors are streaming accumulators with do_/get_value
    pairs, /root/reference/src/song/mod.rs:381-387 — here the accumulator
    state lives in Spark's state store and survives batches).

    Emits one (user_id, n_events, total_value, batches_seen) row per user
    per batch in which that user appeared.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(events_dir)

    def update(key, pdfs, state: GroupState):
        n, total, batches = state.get if state.exists else (0, 0.0, 0)
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
            total += float(pdf["value"].sum())
        n += seen
        batches += 1
        state.update((n, total, batches))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "batches_seen": [batches],
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double, batches_seen int",
        stateStructType="n long, total double, batches int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ingest_rate_monitor(
    spark: SparkSession,
    events_dir: str,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
):
    """Windowed event-rate aggregation with late-data watermarking over the
    events stream (ts, event_type, value columns).  Returns the streaming
    DataFrame; callers attach a sink."""
    ev = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
