"""Round-4 gate: batch query paths hold NO driver structure proportional to
tombstone count (VERDICT r3 "what's missing" #2).

The reference applies deletes inside the query engine itself
(/root/reference/src/library.rs:1695-1749); the Spark analogue is the
per-(unit, shard) dead-set frame cogrouped with the blocks it masks
(operators/wand.py:_dead_sets_df).  These tests prove:

1. the production paths (query_index / query_index_batch) never collect the
   tombstones frame — IndexStore.tombstone_dict is monkeypatched to raise,
   and the exact passed frame's collect/toPandas are instance-poisoned;
2. the dead-set machinery is exercised at ~10^5 tombstone rows (a synthetic
   churn frame far larger than the corpus) with rank-identical results —
   dead ids outside the corpus are dropped by the searchsorted translation,
   never scored, and never land on the driver.
"""

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.plans.lifecycle import (
    build_full,
    query_index,
    query_index_batch,
    update_index,
)
from bliss_rs_spark.sources.index_store import IndexStore

CFG = IndexConfig(block_size=16, n_doc_shards=4, n_term_buckets=8)


@pytest.fixture()
def churn_store(spark, tmp_path):
    """Segment store with real deletions -> real tombstones on disk."""
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 180, seed=11))
    build_full(spark, docs, store, CFG, checkpoint=False)
    update_index(
        spark,
        docs.filter(F.col("doc_id") % 7 != 0),
        store,
        CFG,
        delete_missing=True,
        repack="segment",
    )
    assert store.has_tombstones(spark)
    return store, docs


def _poison(monkeypatch):
    def boom(self, spark):
        raise AssertionError(
            "tombstone_dict collected on a query path — driver structure "
            "proportional to churn"
        )

    monkeypatch.setattr(IndexStore, "tombstone_dict", boom)


def test_query_paths_never_collect_tombstones(spark, churn_store, monkeypatch):
    store, docs = churn_store
    _poison(monkeypatch)
    live = {
        int(r["doc_id"])
        for r in docs.filter(F.col("doc_id") % 7 != 0).select("doc_id").collect()
    }
    rows = query_index(spark, store, "varbyte merge return", k=10).collect()
    assert rows, "query over churned store returned nothing"
    assert all(int(r["doc_id"]) in live for r in rows)

    batch = query_index_batch(
        spark, store, [(0, "varbyte merge return", 10), (1, "return", 5)]
    ).collect()
    assert batch
    assert all(int(r["doc_id"]) in live for r in batch)
    # single-query and batch kernels agree rank-for-rank
    b0 = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in sorted(batch, key=lambda r: r["rank"])
        if r["query_id"] == 0
    ]
    s0 = [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in rows]
    assert b0 == s0


def test_batch_wand_at_1e5_tombstones_stays_distributed(spark, churn_store):
    """10^5-row churn frame (mostly ids outside the corpus, as after mass
    re-ingest): results identical to the real-tombstone answer, and the
    exact frame handed in is poisoned against any driver collect."""
    from bliss_rs_spark.operators.wand import wand_topk_batch, wand_topk_units

    store, docs = churn_store
    meta = store.meta()
    units = store.packed_units(spark)
    ts = store.load(spark, "term_stats")
    queries = [(0, "varbyte merge return", 10), (1, "return", 5)]

    def run(tomb):
        out = wand_topk_batch(
            spark, None, ts, meta["avgdl"], queries, CFG, units=units,
            tombstones=tomb,
        ).collect()
        return sorted(
            (int(r["query_id"]), int(r["rank"]), int(r["doc_id"]),
             round(float(r["score"]), 9))
            for r in out
        )

    real = store.tombstone_frame(spark)
    want = run(real)

    synthetic = spark.range(100_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(999).cast("int").alias("before_seq"),
    )
    big = real.unionByName(synthetic)
    big.collect = None  # poison: any attribute call on the passed frame's
    big.toPandas = None  # collect path is a TypeError, not a silent collect
    assert run(big) == want

    one = wand_topk_units(
        spark, units, ts, meta["avgdl"], "varbyte merge return", 10, CFG,
        tombstones=big,
    ).collect()
    got = [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in one]
    assert got == [(d, s) for q, _, d, s in want if q == 0]
