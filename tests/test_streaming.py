"""Structured Streaming surfaces: streamed document batches land in the index
store as atomic snapshots; windowed event-rate aggregation with watermark."""

from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents
from bliss_rs_spark.plans.lifecycle import query_index
from bliss_rs_spark.sources.index_store import IndexStore
from bliss_rs_spark.streaming.stream_index import (
    ingest_rate_monitor,
    stream_documents_to_index,
)

CFG = IndexConfig(block_size=16, n_doc_shards=4, n_term_buckets=8)


def test_stream_documents_to_index(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    store = IndexStore(str(tmp_path / "idx"))

    docs = synth_documents(spark, 120, seed=42).cache()
    # two "arriving" batches written as separate parquet drops
    docs.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0).write.parquet(in_dir + "/batch1")
    q = stream_documents_to_index(
        spark, in_dir + "/*", store, CFG, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        assert store.current_snapshot() is not None
        n1 = store.meta()["n_docs"]
        assert 0 < n1 < 120

        docs.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 1).write.parquet(in_dir + "/batch2")
        q.processAllAvailable()
        assert store.meta()["n_docs"] == 120
    finally:
        q.stop()

    # the streamed index answers queries like any batch-built one
    got = query_index(spark, store, "return", 5, use_wand=True).collect()
    assert len(got) == 5


def test_stream_self_compacts(spark, tmp_path):
    """A long-running stream must not accrete packed units without bound:
    the auto-maintenance ladder inside update_index folds them whenever the
    count crosses cfg.compact_max_units (round-2 residual #2)."""
    from dataclasses import replace

    cfg = replace(CFG, compact_max_units=2)
    in_dir = str(tmp_path / "in")
    store = IndexStore(str(tmp_path / "idx"))
    docs = synth_documents(spark, 90, seed=7).cache()
    for i in range(5):
        docs.filter(F.pmod(F.xxhash64("path"), F.lit(5)) == i).repartition(
            1
        ).write.parquet(f"{in_dir}/b{i}")
    q = stream_documents_to_index(
        spark, in_dir + "/*", store, cfg,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert store.meta()["n_docs"] == 90
    assert len(store.packed_units(spark)) <= 2  # self-compacted, never 5
    assert len(query_index(spark, store, "return", 5).collect()) == 5


def test_running_user_stats_stateful(spark, tmp_path):
    """Custom stateful operator: state accumulates across two micro-batches."""
    from bliss_rs_spark.streaming.stream_index import running_user_stats

    in_dir = str(tmp_path / "ev")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).cache()
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(in_dir + "/b1")

    agg = running_user_stats(spark, in_dir + "/*")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.col("event_id") % 2 == 1).write.parquet(in_dir + "/b2")
        q.processAllAvailable()
    finally:
        q.stop()

    # last update per user must equal the full-batch totals
    rows = spark.sql(
        """SELECT user_id, n_events, total_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY batches_seen DESC) rn
             FROM user_stats_t) WHERE rn = 1"""
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in rows}
    exp = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == exp
    # at least one user genuinely accumulated across two batches
    assert any(r["batches_seen"] == 2 for r in spark.sql("SELECT * FROM user_stats_t").collect())


def test_ingest_rate_monitor(spark, tmp_path):
    agg = ingest_rate_monitor(spark, "/root/testdata/sf0.001", window="1 hour", slide="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates_t")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM rates_t").collect()
        assert len(rows) > 0
        total = sum(r["n"] for r in rows)
        expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
        assert total == expected
    finally:
        q.stop()


def test_stream_with_positions_serves_phrases(spark, tmp_path):
    """A streamed store built with positions serves phrase queries through
    the per-unit packed PhraseServer, and a WARM server refresh()es across
    micro-batch snapshots — the streaming x phrase cross-feature path
    (each micro-batch is a segment; each segment packs once, ever)."""
    from dataclasses import replace

    from bliss_rs_spark.operators.phrase import PhraseServer
    from bliss_rs_spark.plans.lifecycle import phrase_query

    cfg = replace(CFG, store_positions=True)
    in_dir = str(tmp_path / "incoming")
    store = IndexStore(str(tmp_path / "idx"))
    docs = synth_documents(spark, 100, seed=11).cache()

    docs.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0).write.parquet(
        in_dir + "/batch1"
    )
    q = stream_documents_to_index(
        spark, in_dir + "/*", store, cfg, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        server = PhraseServer.from_store(spark, store)
        r1 = server.query("posting block codec", 10)
        assert r1  # non-vacuous

        docs.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 1).write.parquet(
            in_dir + "/batch2"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    info = server.refresh(store)
    try:
        assert info["reused_units"] and info["rebuilt_units"], info
        got = server.query("posting block codec", 20)
        exp = [(int(r["doc_id"]), int(r["phrase_tf"]))
               for r in phrase_query(spark, store, "posting block codec", 20).collect()]
        assert got == exp and len(got) > len(r1) - 1
        # proximity rides the same refreshed units
        assert server.query_window("codec posting", 10)
    finally:
        server.close()


def test_stream_with_trigrams_serves_grep(spark, tmp_path):
    """Streaming x grep cross-feature: every micro-batch segment carries a
    trigram frame, so substring queries see new docs immediately and the
    whole match set equals brute force."""
    from dataclasses import replace

    from bliss_rs_spark.corpus import with_invariants
    from bliss_rs_spark.plans.lifecycle import substring_query

    cfg = replace(CFG, store_trigrams=True)
    in_dir = str(tmp_path / "incoming")
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 100, seed=11)).cache()

    docs.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0).drop(
        "doc_id", "content_sha256"
    ).write.parquet(in_dir + "/batch1")
    q = stream_documents_to_index(
        spark, in_dir + "/*", store, cfg, checkpoint_dir=str(tmp_path / "ckpt")
    )
    needle = "posting_block_codec"
    try:
        q.processAllAvailable()
        got1 = {
            r["doc_id"]
            for r in substring_query(spark, store, docs, needle).collect()
        }
        assert got1, "vacuous after batch 1"
        docs.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 1).drop(
            "doc_id", "content_sha256"
        ).write.parquet(in_dir + "/batch2")
        q.processAllAvailable()
    finally:
        q.stop()
    got2 = {
        r["doc_id"] for r in substring_query(spark, store, docs, needle).collect()
    }
    want = {r["doc_id"] for r in docs.collect() if needle in r["content"]}
    assert got2 == want and len(got2) > len(got1)


def test_stream_refreshes_warm_trigram_server(spark, tmp_path):
    """Streaming x WARM grep serving (round 6): a live TrigramServer
    refresh()ed after each micro-batch sees the new docs — the base
    batch's pack cache is reused (only the delta packs), and the match
    set equals brute force at every step."""
    from dataclasses import replace

    from bliss_rs_spark.corpus import with_invariants
    from bliss_rs_spark.operators.trigram import TrigramServer

    cfg = replace(CFG, store_trigrams=True)
    in_dir = str(tmp_path / "incoming")
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 100, seed=11)).cache()
    half1 = F.pmod(F.xxhash64("path"), F.lit(2)) == 0

    docs.filter(half1).drop("doc_id", "content_sha256").write.parquet(
        in_dir + "/batch1"
    )
    q = stream_documents_to_index(
        spark, in_dir + "/*", store, cfg, checkpoint_dir=str(tmp_path / "ckpt")
    )
    needle = "posting_block_codec"
    srv = None
    try:
        q.processAllAvailable()
        srv = TrigramServer.from_store(spark, store, docs.filter(half1))
        got1 = set(srv.grep(needle))
        want1 = {
            r["doc_id"]
            for r in docs.filter(half1).collect()
            if needle in r["content"]
        }
        assert got1 == want1 and got1, "vacuous after batch 1"

        docs.filter(~half1).drop("doc_id", "content_sha256").write.parquet(
            in_dir + "/batch2"
        )
        q.processAllAvailable()
        info = srv.refresh(store, docs=docs)
        assert info["reused_units"], "base unit should reuse its pack cache"
        assert info["rebuilt_units"], "delta segment should pack fresh"
        got2 = set(srv.grep(needle))
        want = {r["doc_id"] for r in docs.collect() if needle in r["content"]}
        assert got2 == want and len(got2) > len(got1)
    finally:
        if srv is not None:
            srv.close()
        q.stop()
