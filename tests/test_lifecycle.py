"""Index lifecycle integration tests — the store-level test tier of the
reference (tempdir SQLite libraries: upsert/update/delete/failed-song/version
flows, /root/reference/src/library.rs:1772+)."""

import math

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.plans.lifecycle import build_full, query_index, update_index
from bliss_rs_spark.sources.index_store import IndexStore
from tests.oracle import OracleIndex

CFG = IndexConfig(block_size=16, n_doc_shards=4, n_term_buckets=8)


def _docs(spark, n=150, seed=42):
    return with_invariants(synth_documents(spark, n, seed=seed))


def _canon_snapshot(spark, store):
    """Logical content of the CURRENT snapshot, including packed block bytes."""
    out = {}
    for frame in ("doc_stats", "postings", "term_stats", "manifest"):
        df = store.load(spark, frame)
        out[frame] = sorted(repr(sorted(r.asDict().items())) for r in df.collect())
    packed = {}
    for row in store.load(spark, "packed").collect():
        packed[(row["shard"], row["term"])] = tuple(
            (b["first_doc"], b["last_doc"], b["n"], b["max_tsc"],
             bytes(b["docs"]), bytes(b["tfs"]), bytes(b["dls"]))
            for b in row["blocks"]
        )
    out["packed"] = packed
    return out


def test_full_build_and_query(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    name = build_full(spark, _docs(spark), store, CFG)
    assert name == "v00001"
    meta = store.meta()
    assert meta["n_docs"] == 150

    rows = _docs(spark).select("doc_id", "lang", "content").collect()
    oracle = OracleIndex([r.asDict() for r in rows])
    for use_wand in (True, False):
        got = query_index(spark, store, "varbyte merge return", 10, use_wand=use_wand).collect()
        exp = oracle.topk("varbyte merge return", 10)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp]
        for r, (_, es) in zip(got, exp):
            assert math.isclose(r["score"], es, rel_tol=1e-9)


def test_incremental_skip_and_upsert(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    docs_a = _docs(spark, 120)
    build_full(spark, docs_a, store, CFG, checkpoint=False)
    epoch_avgdl = store.meta()["avgdl"]

    # second batch: same corpus + 30 new docs -> only 30 processed
    docs_b = _docs(spark, 150)
    name = update_index(spark, docs_b, store, CFG)
    assert name == "v00002"
    import json, os
    with open(os.path.join(store.snapshot_dir(), "metrics.json")) as f:
        m = json.load(f)
    assert m["docs_processed"] == 30
    assert m["docs_skipped"] == 120
    assert store.meta()["n_docs"] == 150
    # the update pins the epoch avgdl; the exact running value is tracked
    assert store.meta()["avgdl"] == epoch_avgdl
    assert store.meta()["avgdl_exact"] != epoch_avgdl

    # updated snapshot must equal a from-scratch build with the same pinned
    # avgdl — including byte-identical packed blocks in EVERY shard
    store2 = IndexStore(str(tmp_path / "idx2"))
    build_full(spark, docs_b, store2, CFG, checkpoint=False, avgdl_override=epoch_avgdl)
    assert _canon_snapshot(spark, store) == _canon_snapshot(spark, store2)


def test_incremental_update_is_o_delta(spark, tmp_path):
    """THE scale property: a small delta rewrites only the doc-shards it
    touches.  Untouched packed partitions in the new snapshot are hard links
    of the previous snapshot's files (same inode — zero bytes written), the
    old segments are never rewritten, and only one new (delta-sized) segment
    appears."""
    import json
    import os

    cfg = IndexConfig(block_size=16, n_doc_shards=16, n_term_buckets=8)
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 300)
    build_full(spark, docs, store, cfg, checkpoint=False)
    v1 = store.current_snapshot()
    seg1 = store.meta()["segments"]

    def inodes(snapshot):
        out = {}
        root = os.path.join(store.path, snapshot, "packed")
        for shard_dir in os.listdir(root):
            if not shard_dir.startswith("shard="):
                continue
            d = os.path.join(root, shard_dir)
            out[shard_dir] = {
                f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")
            }
        return out

    seg1_mtimes = {
        f: os.stat(os.path.join(store.segments_dir, seg1[0], "postings", f)).st_mtime_ns
        for f in os.listdir(os.path.join(store.segments_dir, seg1[0], "postings"))
    }
    ino_before = inodes(v1)

    # delta: 5 changed docs + 10 new docs
    docs_b = _docs(spark, 310).withColumn(
        "content",
        F.when(F.col("doc_id") % 60 == 0, F.concat(F.col("content"), F.lit("\nzzdeltazz")))
        .otherwise(F.col("content")),
    ).drop("doc_id", "content_sha256")
    update_index(spark, docs_b, store, cfg)
    v2 = store.current_snapshot()

    with open(os.path.join(store.snapshot_dir(), "metrics.json")) as f:
        m = json.load(f)
    assert m["n_shards_repacked"] + m["n_shards_carried"] >= 16
    assert m["n_shards_carried"] > 0, "a 15-doc delta must not touch every shard"

    # every carried shard is hard-linked: identical inodes, no data written
    ino_after = inodes(v2)
    carried = 0
    for shard_dir, files in ino_after.items():
        if shard_dir in ino_before and files == ino_before[shard_dir]:
            carried += 1
    assert carried == m["n_shards_carried"]

    # the original segment was not touched (same files, same mtimes)
    seg1_mtimes_after = {
        f: os.stat(os.path.join(store.segments_dir, seg1[0], "postings", f)).st_mtime_ns
        for f in os.listdir(os.path.join(store.segments_dir, seg1[0], "postings"))
    }
    assert seg1_mtimes_after == seg1_mtimes
    assert len(store.meta()["segments"]) == 2

    # and the result is STILL exactly a pinned-avgdl full rebuild
    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(
        spark,
        docs_b,
        fresh,
        cfg,
        checkpoint=False,
        avgdl_override=store.meta()["avgdl"],
    )
    assert _canon_snapshot(spark, store) == _canon_snapshot(spark, fresh)


def test_update_modified_content(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 100)
    build_full(spark, docs, store, CFG, checkpoint=False)

    # modify 10 docs' content (same identity -> same doc_id; content change
    # is detected via content_sha256, the upsert path)
    modified = docs.withColumn(
        "content",
        F.when(F.col("doc_id") % 10 == 0, F.concat(F.col("content"), F.lit("\nzzqmutatedzz")))
        .otherwise(F.col("content")),
    ).drop("content_sha256").withColumn("content_sha256", F.sha2("content", 256))
    update_index(spark, modified, store, CFG)

    got = query_index(spark, store, "zzqmutatedzz", 50, use_wand=False).collect()
    n_mod = docs.filter(F.col("doc_id") % 10 == 0).count()
    assert len(got) == n_mod  # old postings replaced, new token findable


def test_delete_missing(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 100)
    build_full(spark, docs, store, CFG, checkpoint=False)
    shrunk = docs.filter(F.col("doc_id") % 3 != 0)
    update_index(spark, shrunk, store, CFG, delete_missing=True)
    assert store.meta()["n_docs"] == shrunk.count()
    # vanished docs must not be retrievable
    remaining = {r["doc_id"] for r in store.load(spark, "doc_stats").collect()}
    assert remaining == {r["doc_id"] for r in shrunk.select("doc_id").collect()}


def test_segment_repack_zero_rewrite_and_exact(spark, tmp_path):
    """repack='segment': NO existing packed block is read-modified — the
    whole base is hard-linked and only the delta segment gets its own pack.
    Queries over the multi-unit store (changed + new + deleted docs) stay
    rank-identical to a from-scratch build of the same corpus, through both
    the exhaustive path and the units WAND kernel (tombstoned docs dropped
    at block-decode time)."""
    import json
    import os

    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 200)
    build_full(spark, docs, store, CFG, checkpoint=False)
    v1 = store.current_snapshot()

    def packed_inodes(snapshot):
        root = os.path.join(store.path, snapshot, "packed")
        return {
            os.path.join(d, f): os.stat(os.path.join(root, d, f)).st_ino
            for d in os.listdir(root) if d.startswith("shard=")
            for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")
        }

    ino_v1 = packed_inodes(v1)

    # delta: changed + new docs, plus deletions
    docs_b = _docs(spark, 220).withColumn(
        "content",
        F.when(F.col("doc_id") % 9 == 0, F.concat(F.col("content"), F.lit("\nzzsegzz")))
        .otherwise(F.col("content")),
    ).drop("doc_id", "content_sha256")
    docs_b = with_invariants(docs_b).filter(F.col("doc_id") % 17 != 3)
    update_index(spark, docs_b, store, CFG, delete_missing=True, repack="segment")
    v2 = store.current_snapshot()

    with open(os.path.join(store.snapshot_dir(), "metrics.json")) as f:
        m = json.load(f)
    assert m["repack_mode"] == "segment"
    assert m["n_shards_repacked"] == 0
    assert m["n_packed_units"] == 2
    # the ENTIRE base is hard-linked: identical inode map, zero bytes written
    assert packed_inodes(v2) == ino_v1

    # rank+score identity vs a from-scratch build, both query paths
    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, docs_b, fresh, CFG, checkpoint=False,
               avgdl_override=store.meta()["avgdl"])
    for q in ["varbyte merge return", "blockMaxScore", "return", "zzsegzz"]:
        for use_wand in (True, False):
            got = [(r["doc_id"], round(r["score"], 9))
                   for r in query_index(spark, store, q, 15, use_wand=use_wand).collect()]
            exp = [(r["doc_id"], round(r["score"], 9))
                   for r in query_index(spark, fresh, q, 15, use_wand=use_wand).collect()]
            assert got == exp, (q, use_wand)

    # a second segment update stacks another unit; merge requests fall back
    docs_c = with_invariants(_docs(spark, 240).drop("doc_id", "content_sha256")).filter(
        F.col("doc_id") % 17 != 3
    )
    update_index(spark, docs_c, store, CFG, repack="merge")  # auto-falls back
    with open(os.path.join(store.snapshot_dir(), "metrics.json")) as f:
        m2 = json.load(f)
    assert m2["repack_mode"] == "segment"
    assert m2["n_packed_units"] == 3

    # compaction folds everything back into one unit and clears tombstones
    build_full(spark, docs_c, store, CFG, checkpoint=False)
    assert len(store.packed_units(spark)) == 1
    assert store.load(spark, "tombstones").count() == 0


def test_wand_server_over_segment_store(spark, tmp_path):
    from bliss_rs_spark.operators.wand import WandServer

    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 150)
    build_full(spark, docs, store, CFG, checkpoint=False)
    docs_b = _docs(spark, 170).withColumn(
        "content",
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("content"), F.lit("\nzzsrvzz")))
        .otherwise(F.col("content")),
    ).drop("doc_id", "content_sha256")
    update_index(spark, with_invariants(docs_b), store, CFG, repack="segment")

    server = WandServer.from_store(spark, store)
    assert server.single_stage
    for q in ["varbyte merge return", "zzsrvzz", "return"]:
        got = server.query(q, 10)
        exp = [(r["doc_id"], r["score"])
               for r in query_index(spark, store, q, 10, use_wand=True).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, gs), (_, es) in zip(got, exp):
            assert math.isclose(gs, es, rel_tol=1e-12)
    server.close()


def test_delete_only_update_then_add_not_stale(spark, tmp_path):
    """Regression (round-3 advice, high): a delete-only merge update writes
    NO segment but used to advance packed_base_seq to the reserved (unused)
    seq; the next real segment then reused that seq, packed_units() skipped
    its pack (strict seg_seq > base_seq), and WAND/serve silently missed the
    new docs while serving stale superseded rows."""
    from bliss_rs_spark.operators.wand import WandServer

    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 100)
    build_full(spark, docs, store, CFG, checkpoint=False)

    # delete-only merge update: n_delta == 0, so no segment is written
    shrunk = docs.filter(F.col("doc_id") % 5 != 0)
    update_index(spark, shrunk, store, CFG, delete_missing=True)
    assert len(store.meta()["segments"]) == 1
    assert store.meta()["packed_base_seq"] == 1  # NOT the reserved seq 2

    # now a real update: new docs + changed docs, in its own segment pack
    docs_c = with_invariants(
        _docs(spark, 120).withColumn(
            "content",
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.col("content"), F.lit("\nzzstalezz")))
            .otherwise(F.col("content")),
        ).drop("doc_id", "content_sha256")
    ).filter(F.col("doc_id") % 5 != 0)
    update_index(spark, docs_c, store, CFG, repack="segment")
    assert len(store.packed_units(spark)) == 2  # the new unit is VISIBLE

    # the new segment's docs must be served (not silently missing/stale)
    got = query_index(spark, store, "zzstalezz", 50, use_wand=True).collect()
    exp = query_index(spark, store, "zzstalezz", 50, use_wand=False).collect()
    assert len(got) > 0
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
           [(r["doc_id"], round(r["score"], 9)) for r in exp]
    server = WandServer.from_store(spark, store)
    assert [d for d, _ in server.query("zzstalezz", 50)] == [r["doc_id"] for r in got]
    server.close()


def test_layout1_store_batch_and_server(spark, tmp_path):
    """Regression (round-3 advice, low): query_index_batch and
    WandServer.from_store on a layout-1 (pre-segment) store must not crash
    on the missing tombstones frame."""
    import json
    import os
    import shutil

    from bliss_rs_spark.operators.wand import WandServer
    from bliss_rs_spark.plans.lifecycle import query_index_batch

    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 80), store, CFG, checkpoint=False)
    # rewrite the snapshot as layout-1: no segment bookkeeping, no tombstones
    snap = store.snapshot_dir()
    meta = store.meta()
    seg = meta["segments"][0]
    for frame in ("postings", "doc_stats", "manifest", "errors"):
        shutil.copytree(
            os.path.join(store.segments_dir, seg, frame),
            os.path.join(snap, frame),
        )
    shutil.rmtree(os.path.join(snap, "tombstones"))
    for k in ("segments", "packed_base_seq", "layout"):
        meta.pop(k, None)
    with open(os.path.join(snap, "config.json"), "w") as f:
        json.dump(meta, f)

    assert store.tombstone_dict(spark) == {}
    units = store.packed_units(spark)
    assert len(units) == 1 and units[0][0] == 0
    rows = query_index_batch(spark, store, [(1, "varbyte merge return", 5)]).collect()
    assert len(rows) == 5
    server = WandServer.from_store(spark, store)
    got = server.query("varbyte merge return", 5)
    exp = query_index(spark, store, "varbyte merge return", 5, use_wand=False).collect()
    assert [d for d, _ in got] == [r["doc_id"] for r in exp]
    server.close()


def test_all_failed_update_batch_keeps_store_readable(spark, tmp_path):
    """Regression (round-3 advice, low): an update whose delta ALL fails
    tokenization writes empty postings/doc_stats segment frames; those must
    still be schema-readable (empty frames can otherwise be coalesced to
    zero parquet files)."""
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 60)
    build_full(spark, docs, store, CFG, checkpoint=False)

    poisoned = with_invariants(
        spark.createDataFrame(
            [("r_poison", f"p{i}.rs", "c0", "rust", None) for i in range(5)],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    update_index(spark, docs.unionByName(poisoned), store, CFG)

    # every frame still readable; failed docs in the ledger; queries fine
    assert store.load(spark, "errors").count() >= 1
    assert store.load(spark, "postings").count() > 0
    assert store.meta()["n_docs"] == 60
    assert len(query_index(spark, store, "return", 3).collect()) == 3


def test_all_failed_segment_update_keeps_store_servable(spark, tmp_path):
    """Segment-mode variant of the all-failed regression: the delta's own
    (empty) pack must still be schema-readable, and every query path —
    exhaustive, units WAND, WandServer, batch — keeps working."""
    from bliss_rs_spark.operators.wand import WandServer
    from bliss_rs_spark.plans.lifecycle import query_index_batch

    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 60)
    build_full(spark, docs, store, CFG, checkpoint=False)
    poisoned = with_invariants(
        spark.createDataFrame(
            [("r_poison", f"p{i}.rs", "c0", "rust", None) for i in range(4)],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    update_index(spark, docs.unionByName(poisoned), store, CFG, repack="segment")

    assert store.meta()["n_docs"] == 60
    units = store.packed_units(spark)  # must not crash on the empty pack
    assert all(u[1].count() >= 0 for u in units)
    assert len(query_index(spark, store, "varbyte merge return", 5).collect()) == 5
    assert len(query_index_batch(spark, store, [(1, "return", 5)]).collect()) == 5
    server = WandServer.from_store(spark, store)
    assert len(server.query("varbyte merge return", 5)) == 5
    server.close()


def test_version_sanity_refusal(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 60), store, CFG, checkpoint=False)
    newer = IndexConfig(block_size=16, n_doc_shards=4, n_term_buckets=8, analyzer_version=2)
    with pytest.raises(ValueError, match="refusing to mix"):
        update_index(spark, _docs(spark, 60), store, newer)


def test_failed_rows_ledger(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 80)
    # poison 5 docs with null content
    poisoned = docs.withColumn(
        "content", F.when(F.col("doc_id") % 16 == 0, F.lit(None)).otherwise(F.col("content"))
    )
    build_full(spark, poisoned, store, CFG, checkpoint=False)
    errors = store.load(spark, "errors").collect()
    n_bad = poisoned.filter(F.col("content").isNull()).count()
    assert len(errors) == n_bad
    assert all(e["error"] == "null content" for e in errors)
    assert store.meta()["n_docs"] == 80 - n_bad
    failed = store.load(spark, "manifest").filter("status = 'failed'").count()
    assert failed == n_bad


def test_positional_store_and_update_inheritance(spark, tmp_path):
    """An index built with store_positions must keep answering phrase queries
    after an update that passes cfg=None (layout inherited from the store —
    regression: the default cfg used to silently drop the positional frame)."""
    from dataclasses import replace

    from bliss_rs_spark.plans.lifecycle import phrase_query

    cfg = replace(CFG, store_positions=True)
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 120), store, cfg, checkpoint=False)
    before = {(r["doc_id"], r["phrase_tf"])
              for r in phrase_query(spark, store, "block max score", 10).collect()}
    assert before, "phrase query found nothing on the positional index"

    update_index(spark, _docs(spark, 150), store, None)  # cfg inherited
    assert store.config().store_positions
    after = {(r["doc_id"], r["phrase_tf"])
             for r in phrase_query(spark, store, "block max score", 10).collect()}
    # incremental result == from-scratch positional build on the same corpus
    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, _docs(spark, 150), fresh, cfg, checkpoint=False)
    scratch = {(r["doc_id"], r["phrase_tf"])
               for r in phrase_query(spark, fresh, "block max score", 10).collect()}
    assert after == scratch

    # an index built WITHOUT positions refuses phrase queries with guidance
    store2 = IndexStore(str(tmp_path / "idx2"))
    build_full(spark, _docs(spark, 60), store2, CFG, checkpoint=False)
    with pytest.raises(ValueError, match="store_positions"):
        phrase_query(spark, store2, "block max", 5)


def test_checkpoint_compaction(spark, tmp_path):
    import os

    store = IndexStore(str(tmp_path / "idx"))
    # three appends -> many small files
    for n in (40, 80, 120):
        build_full(spark, _docs(spark, n), store, CFG, checkpoint=True)
    before_rows = store.load_checkpoint(spark).count()
    n_files_before = sum(
        1 for f in os.listdir(store.checkpoint_dir) if f.endswith(".parquet")
    )
    store.compact_checkpoint(spark, target_partitions=2)
    after = store.load_checkpoint(spark)
    assert after.count() == before_rows
    n_files_after = sum(
        1 for f in os.listdir(store.checkpoint_dir) if f.endswith(".parquet")
    )
    assert n_files_after < n_files_before
    # a subsequent incremental build still resumes correctly from it
    build_full(spark, _docs(spark, 150), store, CFG, checkpoint=True)
    assert store.load_checkpoint(spark).count() == 150
    assert store.meta()["n_docs"] == 150


def test_concurrent_commit_detected(spark, tmp_path):
    """Optimistic concurrency (Iceberg CAS analogue): a commit derived from a
    snapshot that is no longer CURRENT must fail loudly, discard its staged
    data, and leave the winner's snapshot intact — never silently drop the
    other writer's delta."""
    from bliss_rs_spark.sources.index_store import ConcurrentCommitError

    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 80), store, CFG, checkpoint=False)
    v1 = store.current_snapshot()

    # writer B wins the race
    update_index(spark, _docs(spark, 100), store, CFG)
    v2 = store.current_snapshot()
    assert v2 != v1
    assert store.meta()["parent_snapshot"] == v1  # lineage recorded

    # writer A (stale parent v1) must be refused
    with pytest.raises(ConcurrentCommitError, match="re-read and retry"):
        store.commit_snapshot(
            {
                "term_stats": store.load(spark, "term_stats"),
                "tombstones": store.empty_tombstones(spark),
            },
            store.meta(),
            {},
            expected_parent=v1,
        )
    assert store.current_snapshot() == v2
    assert store.snapshots() == [v1, v2]  # loser's staged snapshot discarded
    assert len(query_index(spark, store, "return", 3).collect()) == 3


def test_orphan_segment_after_crash(spark, tmp_path):
    """Crash between segment write and snapshot commit: the orphan segment
    is INVISIBLE (no snapshot references it), later updates allocate fresh
    seqs past it, and gc() reclaims it."""
    from bliss_rs_spark.operators.build_index import tokenize_documents
    from bliss_rs_spark.plans.lifecycle import _write_segment_from_tokenized

    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 100), store, CFG, checkpoint=False)

    # simulate the crash: a segment lands on disk, no commit follows
    tokenized = tokenize_documents(_docs(spark, 110), CFG)
    orphan = store.next_segment_name()
    _write_segment_from_tokenized(spark, tokenized, store, CFG, orphan)
    assert orphan in store.segments()
    assert store.meta()["segments"] == ["seg_000001"]  # invisible
    assert store.meta()["n_docs"] == 100
    assert len(query_index(spark, store, "varbyte merge return", 5).collect()) == 5

    # the next real update allocates a FRESH seq past the orphan
    update_index(spark, _docs(spark, 120), store, CFG, repack="segment")
    assert store.meta()["n_docs"] == 120
    assert orphan not in store.meta()["segments"]
    assert store.seg_seq(store.meta()["segments"][-1]) > store.seg_seq(orphan)

    removed = store.gc(keep_last=2)
    assert f"segments/{orphan}" in removed
    assert len(query_index(spark, store, "varbyte merge return", 5).collect()) == 5


def test_snapshot_gc(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 60)
    build_full(spark, docs, store, CFG, checkpoint=False)
    update_index(spark, _docs(spark, 80), store, CFG)
    update_index(spark, _docs(spark, 100), store, CFG)
    assert store.snapshots() == ["v00001", "v00002", "v00003"]
    removed = store.gc(keep_last=2)
    assert removed == ["v00001"]
    assert store.current_snapshot() == "v00003"
    # store still answers queries after GC
    assert len(query_index(spark, store, "return", 3, use_wand=True).collect()) == 3


def test_resumable_build_identical(spark, tmp_path):
    """Kill-and-restart: a build that checkpointed only part of the corpus
    resumes and produces a snapshot identical to a from-scratch build
    (FIXTURES.md §6 resume corpus)."""
    from bliss_rs_spark.plans.lifecycle import _tokenize_with_checkpoint

    docs = _docs(spark, 140)
    store = IndexStore(str(tmp_path / "idx"))

    # simulate a killed build: only half the corpus reached the checkpoint,
    # no snapshot was committed
    half = docs.filter(F.col("doc_id") % 2 == 0)
    _tokenize_with_checkpoint(spark, half, store, CFG)
    assert store.current_snapshot() is None  # crash before commit

    # restart the full build; only the missing half may be re-tokenized
    before = store.load_checkpoint(spark).count()
    build_full(spark, docs, store, CFG, checkpoint=True)
    after = store.load_checkpoint(spark).count()
    assert after == 140 and before == half.count()  # no duplicate work

    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, docs, fresh, CFG, checkpoint=False)
    assert _canon_snapshot(spark, store) == _canon_snapshot(spark, fresh)


def test_segment_update_df_source_checkpoint_exact(spark, tmp_path):
    """Segment-mode updates on a checkpointed store take their exact
    df/sum_dl decrements from the tokenize checkpoint (no packed-unit
    decode) — and the resulting snapshot is IDENTICAL to the packed-decode
    path's (term_stats, packed, meta)."""
    import json
    import os

    stores = {}
    for src in ("checkpoint", "packed"):
        store = IndexStore(str(tmp_path / f"idx_{src}"))
        docs = _docs(spark, 150)
        build_full(spark, docs, store, CFG)  # checkpoint=True default
        delta = with_invariants(
            _docs(spark, 165).withColumn(
                "content",
                F.when(F.col("doc_id") % 6 == 0,
                       F.concat(F.col("content"), F.lit("\nzzdfszz")))
                .otherwise(F.col("content")),
            ).drop("doc_id", "content_sha256")
        ).filter(F.col("doc_id") % 13 != 2)
        update_index(spark, delta, store, None, delete_missing=True,
                     repack="segment", df_source=src, auto_maintain=False)
        with open(os.path.join(store.snapshot_dir(), "metrics.json")) as f:
            m = json.load(f)
        assert m["df_source"] == ("checkpoint" if src == "checkpoint" else "packed_decode")
        assert m["docs_removed"] > 0
        stores[src] = store

    a, b = stores["checkpoint"], stores["packed"]
    canon_a, canon_b = _canon_snapshot(spark, a), _canon_snapshot(spark, b)
    assert canon_a == canon_b
    assert a.meta()["n_docs"] == b.meta()["n_docs"]
    assert a.meta()["sum_dl"] == b.meta()["sum_dl"]


def test_auto_maintain_folds_units(spark, tmp_path):
    """update_index auto-runs the maintenance ladder: a stream of
    segment-mode updates may never stack more than compact_max_units packed
    units — the store self-compacts (round-2 residual: nothing triggered
    compact_packs)."""
    from dataclasses import replace

    cfg = replace(CFG, compact_max_units=3)
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 80), store, cfg)
    for n in (90, 100, 110, 120, 130):
        update_index(spark, _docs(spark, n), store, None, repack="segment")
        assert len(store.packed_units(spark)) <= 3  # ladder ran post-commit
    # at least one fold actually happened and queries stayed exact
    assert len(store.packed_units(spark)) <= 3
    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, _docs(spark, 130), fresh, cfg, checkpoint=False,
               avgdl_override=store.meta()["avgdl"])
    for q in ["varbyte merge return", "return"]:
        got = [(r["doc_id"], round(r["score"], 9))
               for r in query_index(spark, store, q, 10).collect()]
        exp = [(r["doc_id"], round(r["score"], 9))
               for r in query_index(spark, fresh, q, 10).collect()]
        assert got == exp, q


def test_auto_maintain_tombstone_full_compact(spark, tmp_path):
    """Churn rung: when tombstones exceed compact_max_tombstone_ratio x
    n_docs, the store full-compacts FROM ITS OWN CHECKPOINT — segments fold
    to one, tombstones clear, avgdl re-pins — without the caller re-supplying
    the corpus."""
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 100)
    build_full(spark, docs, store, CFG)
    shrunk = docs.filter(F.col("doc_id") % 3 != 0)  # drop ~33% > 25% ratio
    update_index(spark, shrunk, store, None, delete_missing=True, repack="segment")
    # the post-commit ladder ran compact_full: clean single-segment store
    assert store.load(spark, "tombstones").count() == 0
    assert len(store.meta()["segments"]) == 1
    assert len(store.packed_units(spark)) == 1
    n_live = shrunk.count()
    assert store.meta()["n_docs"] == n_live
    assert store.meta()["avgdl"] == store.meta()["avgdl_exact"]  # re-pinned
    # identical to a from-scratch build of the surviving corpus
    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, shrunk, fresh, CFG, checkpoint=False)
    assert _canon_snapshot(spark, store) == _canon_snapshot(spark, fresh)


def test_auto_maintain_absolute_tombstone_trigger(spark, tmp_path):
    """Round-4: the ABSOLUTE tombstone ceiling fires even when the ratio rung
    would not — the ratio alone is corpus-fraction-sized (0.25 of 10^9 docs
    is 2.5e8 rows of dead-set debt before compaction)."""
    from dataclasses import replace

    # ratio effectively disabled, absolute cap tiny: 5% churn must compact
    cfg = replace(CFG, compact_max_tombstone_ratio=0.99, compact_max_tombstones=3)
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 100)
    build_full(spark, docs, store, cfg)
    shrunk = docs.filter(F.col("doc_id") % 20 != 0)  # ~5% deleted: > 3 abs
    update_index(spark, shrunk, store, None, delete_missing=True, repack="segment")
    assert store.load(spark, "tombstones").count() == 0  # compact_full ran
    assert len(store.meta()["segments"]) == 1
    assert store.meta()["n_docs"] == shrunk.count()


def test_compact_full_refuses_partial_checkpoint(spark, tmp_path):
    """A store whose checkpoint covers only part of the corpus (built with
    checkpoint=False, updated with checkpoint=True) must REFUSE a full
    compaction — rebuilding from the partial checkpoint would silently drop
    every non-checkpointed doc."""
    from bliss_rs_spark.plans.lifecycle import compact_full

    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 80), store, CFG, checkpoint=False)
    update_index(spark, _docs(spark, 90), store, CFG, repack="segment")
    with pytest.raises(ValueError, match="lossy full compaction"):
        compact_full(spark, store)
    assert store.meta()["n_docs"] == 90  # nothing lost


def test_compact_packs_folds_units_query_identical(spark, tmp_path):
    """compact_packs = the Lucene segment-merge for the query structure: many
    packed units (accumulated by segment-mode updates) fold into one base
    with NO re-tokenization and NO segment rewrite; queries are identical
    before and after, and the folded base equals a pinned-avgdl full
    rebuild's packed frame on the same live corpus."""
    import os

    from bliss_rs_spark.plans.lifecycle import compact_packs

    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 150)
    build_full(spark, docs, store, CFG, checkpoint=False)
    # three segment-mode updates: grow, mutate, shrink
    step2 = _docs(spark, 170)
    update_index(spark, step2, store, CFG, repack="segment")
    step3 = with_invariants(
        _docs(spark, 180).withColumn(
            "content",
            F.when(F.col("doc_id") % 8 == 0, F.concat(F.col("content"), F.lit("\nzzcpzz")))
            .otherwise(F.col("content")),
        ).drop("doc_id", "content_sha256")
    ).filter(F.col("doc_id") % 23 != 1)
    update_index(spark, step3, store, CFG, delete_missing=True, repack="segment")
    assert len(store.packed_units(spark)) >= 3

    queries = ["varbyte merge return", "zzcpzz", "return", "blockMaxScore"]
    before = {q: [(r["doc_id"], round(r["score"], 9))
                  for r in query_index(spark, store, q, 12).collect()] for q in queries}
    seg_dirs = store.meta()["segments"]
    seg_mtimes = {
        s: os.stat(os.path.join(store.segments_dir, s, "postings")).st_mtime_ns
        for s in seg_dirs
    }

    compact_packs(spark, store)
    assert len(store.packed_units(spark)) == 1
    assert store.meta()["segments"] == seg_dirs  # segments untouched
    assert {
        s: os.stat(os.path.join(store.segments_dir, s, "postings")).st_mtime_ns
        for s in seg_dirs
    } == seg_mtimes
    after = {q: [(r["doc_id"], round(r["score"], 9))
                 for r in query_index(spark, store, q, 12).collect()] for q in queries}
    assert after == before

    # folded base == pinned-avgdl full rebuild's packed frame
    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, step3, fresh, CFG, checkpoint=False,
               avgdl_override=store.meta()["avgdl"])
    assert _canon_snapshot(spark, store)["packed"] == _canon_snapshot(spark, fresh)["packed"]

    # idempotent no-op when already one unit and no tombstones... (tombstones
    # remain here, so a second compact still commits but stays single-unit)
    compact_packs(spark, store)
    assert len(store.packed_units(spark)) == 1
