"""Analyzer-version migration — the reference's ordered migration chain
(/root/reference/src/library.rs:530-591) as snapshots: re-tokenize from the
checkpoint's retained content, resumably, then GC stale-version checkpoint
rows."""

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.plans.lifecycle import build_full, migrate, query_index, update_index
from bliss_rs_spark.sources.index_store import IndexStore

CFG_V1 = IndexConfig(block_size=16, n_doc_shards=4, n_term_buckets=8)
CFG_V2 = IndexConfig(block_size=16, n_doc_shards=4, n_term_buckets=8, analyzer_version=2)


def _docs(spark, n=100):
    return with_invariants(synth_documents(spark, n))


def test_migrate_from_checkpoint(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark), store, CFG_V1, checkpoint=True)
    assert store.meta()["analyzer_version"] == 1

    # the store upgrades WITHOUT re-supplying the corpus (checkpoint retains
    # content), and the result equals a fresh v2 build of the same docs
    migrate(spark, store, CFG_V2)
    assert store.meta()["analyzer_version"] == 2
    assert store.meta()["n_docs"] == 100

    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, _docs(spark), fresh, CFG_V2, checkpoint=False)
    got = query_index(spark, store, "varbyte merge return", 10).collect()
    exp = query_index(spark, fresh, "varbyte merge return", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in exp
    ]

    # stale v1 checkpoint rows were GC'd; only v2 remains
    versions = {
        r["analyzer_version"]
        for r in store.load_checkpoint(spark).select("analyzer_version").distinct().collect()
    }
    assert versions == {2}

    # updates at the new version now proceed
    update_index(spark, _docs(spark, 120), store, CFG_V2)
    assert store.meta()["n_docs"] == 120


def test_migrate_refuses_downgrade_and_noops_same_version(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, _docs(spark, 40), store, CFG_V2, checkpoint=True)
    assert migrate(spark, store, CFG_V2) == store.current_snapshot()  # no-op
    with pytest.raises(ValueError, match="downgrade"):
        migrate(spark, store, CFG_V1)


def test_migrate_without_checkpoint_needs_docs(spark, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 60)
    build_full(spark, docs, store, CFG_V1, checkpoint=False)
    with pytest.raises(ValueError, match="docs"):
        migrate(spark, store, CFG_V2)
    migrate(spark, store, CFG_V2, docs=docs)
    assert store.meta()["analyzer_version"] == 2
    assert store.meta()["n_docs"] == 60


def test_migrate_is_resumable(spark, tmp_path):
    """A migration killed after partial v2 tokenization resumes without
    re-tokenizing what it already did (version-aware checkpoint anti-join)."""
    from bliss_rs_spark.plans.lifecycle import _tokenize_with_checkpoint

    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 80)
    build_full(spark, docs, store, CFG_V1, checkpoint=True)

    # simulate the killed first attempt: half the corpus reached the v2
    # checkpoint, no snapshot committed
    half = docs.filter(F.col("doc_id") % 2 == 0)
    _tokenize_with_checkpoint(spark, half, store, CFG_V2)
    assert store.meta()["analyzer_version"] == 1  # still on v1

    n_v2_before = store.load_checkpoint(spark).filter(
        F.col("analyzer_version") == 2
    ).count()
    migrate(spark, store, CFG_V2)
    assert store.meta()["analyzer_version"] == 2
    assert store.meta()["n_docs"] == 80
    assert n_v2_before == half.count()  # the partial work existed and was reused


def test_migrate_segment_store_with_churn(spark, tmp_path):
    """Migration of a MULTI-UNIT store with tombstones (segment updates with
    changes + deletions first): the v2 rebuild folds everything, carries only
    LIVE docs at their CURRENT content, and matches a from-scratch v2 build
    of the same corpus."""
    from bliss_rs_spark.corpus import with_invariants
    from bliss_rs_spark.plans.lifecycle import query_index, update_index

    store = IndexStore(str(tmp_path / "idx"))
    docs = _docs(spark, 120)
    build_full(spark, docs, store, CFG_V1, checkpoint=True)
    docs_b = with_invariants(
        _docs(spark, 140).withColumn(
            "content",
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.col("content"), F.lit("\nzzmigzz")))
            .otherwise(F.col("content")),
        ).drop("doc_id", "content_sha256")
    ).filter(F.col("doc_id") % 13 != 2)
    update_index(spark, docs_b, store, None, delete_missing=True, repack="segment")
    assert store.load(spark, "tombstones").count() > 0

    migrate(spark, store, CFG_V2)
    assert store.meta()["analyzer_version"] == 2
    assert store.meta()["n_docs"] == docs_b.count()
    assert store.load(spark, "tombstones").count() == 0
    assert len(store.meta()["segments"]) == 1

    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, docs_b, fresh, CFG_V2, checkpoint=False)
    for q in ["zzmigzz", "varbyte merge return"]:
        got = [(r["doc_id"], round(r["score"], 9))
               for r in query_index(spark, store, q, 10).collect()]
        exp = [(r["doc_id"], round(r["score"], 9))
               for r in query_index(spark, fresh, q, 10).collect()]
        assert got == exp, q
