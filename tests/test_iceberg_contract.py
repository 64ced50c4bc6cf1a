"""Iceberg-readiness contract.

The north rule targets Iceberg tables; this image carries no Iceberg jar, so
the engine (a) probes for the reader and falls back to parquet
(sources/documents.py), and (b) implements the store with Iceberg-equivalent
semantics so the sink swap is a one-module change.  These tests pin the
contract: the probe path degrades cleanly, and every store operation has an
exact Iceberg counterpart with the invariants Iceberg relies on.

Store op            -> Iceberg op
-------------------    ------------------------------------
write_segment          append (new immutable data files)
tombstones frame       position/equality delete files
commit_snapshot        snapshot commit (atomic pointer swap)
CURRENT                current snapshot id / main branch ref
carry_packed links     manifest reuse of unchanged data files
gc                     expire_snapshots + remove_orphan_files
"""

import os

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.plans.lifecycle import build_full, update_index
from bliss_rs_spark.sources.documents import load_documents
from bliss_rs_spark.sources.index_store import IndexStore

CFG = IndexConfig(block_size=16, n_doc_shards=4, n_term_buckets=8)


def _iceberg_available(spark) -> bool:
    try:
        spark.read.format("iceberg").load("nosuch.catalog.table")
        return True
    except Exception as e:  # jar missing -> ClassNotFound/DataSource not found
        return "iceberg" not in str(e).lower() or "Failed to find" not in str(e)


def test_loader_falls_back_to_parquet_without_jar(spark, tmp_path):
    """fmt=None on a path source must read parquet even when the Iceberg
    reader is absent; fmt='iceberg' must surface the real error."""
    docs = with_invariants(synth_documents(spark, 20))
    dest = str(tmp_path / "docs.parquet")
    docs.select("repo", "path", "commit", "lang", "content").write.parquet(dest)
    out = load_documents(spark, dest)
    assert out.count() == 20
    assert out.columns[:5] == ["repo", "path", "commit", "lang", "content"]

    try:
        spark.read.format("iceberg").load("db.tbl")
        have_iceberg = True
    except Exception:
        have_iceberg = False
    if not have_iceberg:
        with pytest.raises(Exception):
            load_documents(spark, "db.tbl", fmt="iceberg")


def test_segments_are_immutable_and_snapshots_only_reference(spark, tmp_path):
    """Iceberg invariant 1: data files are append-only.  A later commit must
    never modify an existing segment — only write new ones and re-point."""
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 80))
    build_full(spark, docs, store, CFG, checkpoint=False)
    seg1 = store.meta()["segments"][0]
    seg1_dir = os.path.join(store.segments_dir, seg1)
    before = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _, fs in os.walk(seg1_dir) for f in fs
    }
    update_index(spark, with_invariants(synth_documents(spark, 100)), store)
    after = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _, fs in os.walk(seg1_dir) for f in fs
    }
    assert before == after


def test_deletes_are_metadata_not_rewrites(spark, tmp_path):
    """Iceberg invariant 2: row deletion = delete-file metadata, not data
    rewrite.  Removing docs must grow tombstones and leave segments alone."""
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 90))
    build_full(spark, docs, store, CFG, checkpoint=False)
    shrunk = docs.filter(F.col("doc_id") % 3 != 0)
    update_index(spark, shrunk, store, delete_missing=True)
    tombs = store.load(spark, "tombstones").count()
    assert tombs == 90 - shrunk.count()
    assert len(store.meta()["segments"]) == 1  # no new data was written
    # the view honors the delete files
    assert store.load(spark, "doc_stats").count() == shrunk.count()


def test_time_travel_reads_previous_snapshot(spark, tmp_path):
    """Iceberg invariant 3: old snapshots stay readable until expired
    (time travel).  Reading frames of a non-CURRENT snapshot still works."""
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, with_invariants(synth_documents(spark, 50)), store, CFG,
               checkpoint=False)
    v1 = store.current_snapshot()
    update_index(spark, with_invariants(synth_documents(spark, 70)), store)
    assert store.current_snapshot() != v1
    # time-travel read: packed of v1 via its own directory
    old_packed = spark.read.parquet(os.path.join(store.path, v1, "packed"))
    assert old_packed.count() > 0
    import json
    with open(os.path.join(store.path, v1, "config.json")) as f:
        assert json.load(f)["n_docs"] == 50
