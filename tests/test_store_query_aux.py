"""Round-6 store-level query auxiliaries:

- more_like_this_query reads the seed vector from the DOC-KEYED tokenize
  checkpoint (pushed doc_id predicate) and ranks identically to the
  postings-scan path;
- build_expansion_tables materializes the reversed-term / SymSpell tables
  for the CURRENT snapshot; search_index consults them automatically and
  returns byte-identical results to the scan path; gc() prunes expired
  snapshots' tables.
"""

import os

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.plans.lifecycle import (
    build_expansion_tables,
    build_full,
    checkpoint_seed_terms,
    more_like_this_query,
    search_index,
)
from bliss_rs_spark.sources.index_store import IndexStore

CFG = IndexConfig()


@pytest.fixture(scope="module")
def docs(spark):
    d = with_invariants(synth_documents(spark, 150, seed=31)).cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def store(spark, docs, tmp_path_factory):
    s = IndexStore(str(tmp_path_factory.mktemp("aux") / "idx"))
    build_full(spark, docs, s, CFG, checkpoint=True)
    return s


def test_more_like_this_checkpoint_path(spark, docs, store):
    from bliss_rs_spark.operators.query_ops import more_like_this

    seed = int(docs.select(F.min("doc_id")).first()[0])
    meta = store.meta()
    got = more_like_this_query(spark, store, seed, k=10).collect()
    want = more_like_this(
        spark,
        store.load(spark, "postings"),
        store.load(spark, "term_stats"),
        meta["avgdl"],
        seed,
        10,
        cfg=CFG,
    ).collect()
    assert got and [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)
    # plan audit: the seed lookup is a PUSHED doc_id predicate over the
    # doc-keyed checkpoint — no postings scan in the seed subplan
    st = checkpoint_seed_terms(spark, store, seed, CFG)
    assert st is not None
    plan = st._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(doc_id" in plan, plan[:3000]
    assert "postings" not in plan, plan[:3000]


def test_search_index_uses_expansion_tables(spark, store):
    q = "*urn retrun~2 tabl*"
    before = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in search_index(spark, store, q, k=15).collect()
    )
    out = build_expansion_tables(spark, store, fuzzy_max_dist=2)
    assert os.path.isdir(os.path.join(out, "reversed_terms"))
    assert os.path.isdir(os.path.join(out, "deletion_variants"))
    after = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in search_index(spark, store, q, k=15).collect()
    )
    assert before and before == after
    # a query needing deeper fuzz than the table carries falls back to the
    # scan path (still exact)
    deep = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in search_index(spark, store, "retrun~2", k=15).collect()
    )
    assert deep == sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in search_index(spark, store, "retrun~2", k=15).collect()
    )
    # idempotent
    assert build_expansion_tables(spark, store) == out


def test_gc_prunes_expired_expansion_tables(spark, docs, tmp_path):
    from bliss_rs_spark.plans.lifecycle import update_index

    s = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, s, CFG, checkpoint=False)
    v1 = s.current_snapshot()
    build_expansion_tables(spark, s)
    for _ in range(3):  # push v1 out of the retention window
        update_index(
            spark, docs.limit(5), s, None, repack="segment"
        )
    removed = s.gc(keep_last=1)
    assert f"derived/expansions/{v1}" in removed
    assert not os.path.isdir(os.path.join(s.path, "derived", "expansions", v1))


def test_seed_vector_tracks_current_content(spark, docs, tmp_path):
    """Round-6 ADVICE medium: checkpoint_seed_terms must restrict to the
    seed's CURRENT content (the append-only checkpoint keeps old-sha rows
    after an upsert), fall back to postings for never-checkpointed docs,
    and return nothing for tombstoned seeds."""
    from pyspark.sql import functions as F

    from bliss_rs_spark.functions.tokenizer import term_counts
    from bliss_rs_spark.plans.lifecycle import update_index

    store = IndexStore(str(tmp_path / "seed_idx"))
    build_full(spark, docs, store, CFG, checkpoint=True)
    seed = int(docs.select(F.min("doc_id")).first()[0])

    # content-changing upsert: both sha rows now sit in the checkpoint
    changed = docs.withColumn(
        "content",
        F.when(
            F.col("doc_id") == seed,
            F.concat(F.col("content"), F.lit("\nzzupsert zzupsert fresh")),
        ).otherwise(F.col("content")),
    ).withColumn("content_sha256", F.sha2("content", 256))
    update_index(spark, changed, store, CFG)

    st = checkpoint_seed_terms(spark, store, seed, CFG)
    got = {(r["term"], int(r["tf"])) for r in st.collect()}
    new_content = changed.filter(F.col("doc_id") == seed).first()["content"]
    want = set(term_counts(new_content).items())
    assert got == want  # exactly the CURRENT content's vector, no stale mix

    # never-checkpointed doc (checkpoint=False update): falls back to the
    # postings path instead of silently returning empty
    from bliss_rs_spark.operators.query_ops import more_like_this

    changed2 = changed.withColumn(
        "content",
        F.when(
            F.col("doc_id") == seed,
            F.concat(F.col("content"), F.lit("\nnockpt token")),
        ).otherwise(F.col("content")),
    ).withColumn("content_sha256", F.sha2("content", 256))
    update_index(spark, changed2, store, CFG, checkpoint=False)
    assert checkpoint_seed_terms(spark, store, seed, CFG).count() == 0
    meta = store.meta()
    got_q = more_like_this_query(spark, store, seed, k=10).collect()
    want_q = more_like_this(
        spark, store.load(spark, "postings"), store.load(spark, "term_stats"),
        meta["avgdl"], seed, 10, cfg=CFG,
    ).collect()
    assert got_q and [r["doc_id"] for r in got_q] == [r["doc_id"] for r in want_q]

    # tombstoned seed: no vector, empty result
    kept = changed2.filter(F.col("doc_id") != seed)
    update_index(spark, kept, store, CFG, delete_missing=True, repack="segment")
    assert checkpoint_seed_terms(spark, store, seed, CFG).count() == 0
    assert more_like_this_query(spark, store, seed, k=10).count() == 0
