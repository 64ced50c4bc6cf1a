"""Trigram frames through the store lifecycle: build -> grep, delta update
(adds found, deletes dropped via tombstones), and compaction rebuild."""

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.plans.lifecycle import (
    build_full,
    regex_query,
    substring_query,
    update_index,
)
from bliss_rs_spark.sources.index_store import IndexStore

CFG = IndexConfig(store_trigrams=True)
NEEDLE = "return"  # appears verbatim in most synthetic sources


@pytest.fixture(scope="module")
def docs(spark):
    d = with_invariants(synth_documents(spark, 200, seed=11)).cache()
    d.count()
    return d


def _brute(docs, needle):
    return {
        r["doc_id"]
        for r in docs.collect()
        if needle in r["content"]
    }


def test_store_substring_query(spark, docs, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    got = {r["doc_id"] for r in substring_query(spark, store, docs, NEEDLE).collect()}
    want = _brute(docs, NEEDLE)
    assert got == want and want, "vacuous or wrong"
    # regex through the same store
    pat = "return .*loop"
    got_r = {r["doc_id"] for r in regex_query(spark, store, docs, pat).collect()}
    import re

    want_r = {r["doc_id"] for r in docs.collect() if re.search(pat, r["content"])}
    assert got_r == want_r


def test_store_substring_after_churn(spark, docs, tmp_path):
    """Delete every 3rd doc via a segment update: grep must stop returning
    them (tombstone filter inside store.load) without any segment rewrite."""
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    live = docs.filter(F.col("doc_id") % 3 != 0)
    update_index(
        spark, live, store, None, delete_missing=True, repack="segment"
    )
    got = {r["doc_id"] for r in substring_query(spark, store, docs, NEEDLE).collect()}
    want = {d for d in _brute(docs, NEEDLE) if d % 3 != 0}
    assert got == want and want


def test_store_substring_finds_delta_docs(spark, docs, tmp_path):
    """Docs added by an update land in a NEW segment; its trigram frame
    must serve immediately."""
    store = IndexStore(str(tmp_path / "idx"))
    half = docs.filter(F.col("doc_id") % 2 == 0)
    build_full(spark, half, store, CFG, checkpoint=False)
    update_index(spark, docs, store, None, repack="segment")
    got = {r["doc_id"] for r in substring_query(spark, store, docs, NEEDLE).collect()}
    assert got == _brute(docs, NEEDLE)
    # specifically: at least one odd (delta-segment) doc matched
    assert any(d % 2 != 0 for d in got)


def test_missing_trigrams_raises(spark, docs, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, store, IndexConfig(), checkpoint=False)
    with pytest.raises(ValueError, match="store_trigrams"):
        substring_query(spark, store, docs, NEEDLE)

def test_store_grep_ignore_case(spark, docs, tmp_path):
    """The store's folded trigram layout serves grep -i: a lowercased
    needle finds the camelCase occurrences a raw search misses."""
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    raw = {
        r["doc_id"]
        for r in substring_query(spark, store, docs, "blockmaxscore").collect()
    }
    folded = {
        r["doc_id"]
        for r in substring_query(
            spark, store, docs, "blockmaxscore", case_insensitive=True
        ).collect()
    }
    want = {
        r["doc_id"] for r in docs.collect() if "blockmaxscore" in r["content"].lower()
    }
    assert folded == want and folded, "vacuous"
    assert raw < folded  # raw misses the camelCase docs
