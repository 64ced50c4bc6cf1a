"""Metadata-filtered exact top-k: the allow mask through the WAND kernel
(batch units path + WandServer named filters), rank-identical to exhaustive
BM25 over the filtered subset with UNCHANGED corpus stats, composed with
tombstones, and surviving server refresh()."""

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.operators.bm25 import bm25_topk
from bliss_rs_spark.operators.build_index import build_index_frames
from bliss_rs_spark.operators.pack import build_packed_index_full
from bliss_rs_spark.operators.wand import WandServer, wand_topk_units

N_DOCS = 300
QUERY = "return value data"
CFG = IndexConfig(block_size=16, n_doc_shards=8)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_invariants(synth_documents(spark, N_DOCS, seed=7)).cache()
    idx = build_index_frames(docs, CFG)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    packed, doc_map = build_packed_index_full(
        idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, CFG
    )
    packed = packed.cache()
    doc_map = doc_map.cache() if doc_map is not None else None
    return docs, idx, packed, doc_map


def _exhaustive_filtered(spark, idx, allowed, k):
    """Reference: exhaustive BM25 restricted to allowed docs AFTER scoring —
    global df/avgdl (filter semantics), per-doc scores unchanged."""
    full = bm25_topk(
        spark, idx.postings, idx.term_stats, idx.avgdl, QUERY, N_DOCS, CFG
    )
    return (
        full.join(allowed, "doc_id", "left_semi")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )


def test_units_allowed_matches_exhaustive(spark, corpus):
    docs, idx, packed, doc_map = corpus
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id").cache()
    want = _exhaustive_filtered(spark, idx, allowed, 15)
    assert want, "vacuous filter"
    got = wand_topk_units(
        spark, [(0, packed, doc_map)], idx.term_stats, idx.avgdl,
        QUERY, 15, CFG, allowed=allowed,
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)
    # every hit satisfies the predicate
    assert all(r["doc_id"] % 3 == 0 for r in got)


def test_allowed_composes_with_tombstones(spark, corpus):
    docs, idx, packed, doc_map = corpus
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    # kill every 6th doc -> half the allowed set dies
    tomb = docs.filter(F.col("doc_id") % 6 == 0).select(
        "doc_id", F.lit(99).alias("before_seq")
    )
    got = wand_topk_units(
        spark, [(0, packed, doc_map)], idx.term_stats, idx.avgdl,
        QUERY, 15, CFG, tombstones=tomb, allowed=allowed,
    ).collect()
    assert got, "vacuous compose"
    for r in got:
        assert r["doc_id"] % 3 == 0 and r["doc_id"] % 6 != 0
    live_allowed = docs.filter(
        (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 6 != 0)
    ).select("doc_id")
    want = _exhaustive_filtered(spark, idx, live_allowed, 15)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_empty_filter_returns_nothing(spark, corpus):
    docs, idx, packed, doc_map = corpus
    none_allowed = docs.filter(F.lit(False)).select("doc_id")
    got = wand_topk_units(
        spark, [(0, packed, doc_map)], idx.term_stats, idx.avgdl,
        QUERY, 15, CFG, allowed=none_allowed,
    ).collect()
    assert got == []


def test_server_named_filter(spark, corpus):
    docs, idx, packed, doc_map = corpus
    srv = WandServer(
        spark, packed, idx.term_stats, idx.avgdl, CFG, doc_map=doc_map
    )
    try:
        allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
        srv.set_filter("thirds", allowed)
        got = srv.query(QUERY, 15, filter_name="thirds")
        want = _exhaustive_filtered(spark, idx, allowed, 15)
        assert [d for d, _ in got] == [r["doc_id"] for r in want]
        for (d, s), w in zip(got, want):
            assert s == pytest.approx(w["score"], rel=1e-12)
        # unfiltered query on the same server is unaffected
        base = srv.query(QUERY, 15)
        full = bm25_topk(
            spark, idx.postings, idx.term_stats, idx.avgdl, QUERY, 15, CFG
        ).collect()
        assert [d for d, _ in base] == [r["doc_id"] for r in full]
        with pytest.raises(KeyError):
            srv.query(QUERY, 5, filter_name="nope")
        srv.drop_filter("thirds")
        with pytest.raises(KeyError):
            srv.query(QUERY, 5, filter_name="thirds")
    finally:
        srv.close()


def test_server_filter_survives_refresh(spark, corpus, tmp_path):
    """Filters re-shard on refresh(): register on v1, update the store,
    refresh, query — the filter still constrains and ranks exactly."""
    from bliss_rs_spark.plans.lifecycle import build_full, update_index
    from bliss_rs_spark.sources.index_store import IndexStore
    from bliss_rs_spark.operators.wand import wand_topk_units as wtu

    docs, _, _, _ = corpus
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    srv = WandServer.from_store(spark, store)
    try:
        allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
        srv.set_filter("thirds", allowed)
        before = srv.query(QUERY, 10, filter_name="thirds")
        assert before, "vacuous"
        # delete every 6th doc via a segment update, then re-point
        update_index(
            spark,
            docs.filter(F.col("doc_id") % 6 != 0),
            store,
            None,
            delete_missing=True,
            repack="segment",
        )
        srv.refresh(store)
        got = srv.query(QUERY, 10, filter_name="thirds")
        for d, _ in got:
            assert d % 3 == 0 and d % 6 != 0
        meta = store.meta()
        term_stats = store.load(spark, "term_stats")
        want = wtu(
            spark, store.packed_units(spark), term_stats, meta["avgdl"],
            QUERY, 10, store.config(),
            tombstones=store.tombstone_frame(spark),
            allowed=allowed,
        ).collect()
        assert [d for d, _ in got] == [r["doc_id"] for r in want]
    finally:
        srv.close()

def test_batch_allowed_matches_per_query(spark, corpus):
    """wand_topk_batch(allowed=...) == per-query filtered units results for
    every query in the set."""
    from bliss_rs_spark.operators.wand import wand_topk_batch

    docs, idx, packed, doc_map = corpus
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    queries = [(1, QUERY, 10), (2, "varbyte encode merge", 5), (3, "return", 7)]
    got = wand_topk_batch(
        spark, packed, idx.term_stats, idx.avgdl, queries, CFG,
        doc_map=doc_map, allowed=allowed,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert by_q, "vacuous batch"
    for qid, text, k in queries:
        want = wand_topk_units(
            spark, [(0, packed, doc_map)], idx.term_stats, idx.avgdl,
            text, k, CFG, allowed=allowed,
        ).collect()
        got_ids = [d for _, d in sorted(by_q.get(qid, []))]
        assert got_ids == [r["doc_id"] for r in want], text
        for d in got_ids:
            assert d % 3 == 0


def test_phrase_server_named_filter(spark, corpus):
    """PhraseServer filters: query/query_window restricted to the allow set,
    equal to post-filtering the unfiltered full result; unknown name raises;
    composition with dead sets comes free (same kernels)."""
    from bliss_rs_spark.operators.phrase import PhraseServer, build_positional_postings

    docs, _, _, _ = corpus
    pos = build_positional_postings(docs, CFG)
    srv = PhraseServer(spark, pos, CFG, packed=True)
    try:
        allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
        srv.set_filter("thirds", allowed)
        phrase = "posting block codec"
        full = srv.query(phrase, 1_000_000)
        want = [(d, tf) for d, tf in full if d % 3 == 0]
        got = srv.query(phrase, 1_000_000, filter_name="thirds")
        assert got == sorted(want, key=lambda x: (-x[1], x[0]))
        assert got and len(got) < len(full), "vacuous filter"
        # proximity path
        fullw = srv.query_window("codec posting", 1_000_000)
        wantw = sorted((w, d) for d, w in fullw if d % 3 == 0)
        gotw = srv.query_window("codec posting", 1_000_000, filter_name="thirds")
        assert gotw == [(d, w) for w, d in wantw]
        assert gotw and len(gotw) < len(fullw)
        # spans ride the filter too
        gots = srv.query_window(
            "codec posting", 10, with_spans=True, filter_name="thirds"
        )
        assert gots and all(d % 3 == 0 for d, _, _, _ in gots)
        with pytest.raises(KeyError):
            srv.query(phrase, 5, filter_name="nope")
        srv.drop_filter("thirds")
        with pytest.raises(KeyError):
            srv.query(phrase, 5, filter_name="thirds")
    finally:
        srv.close()


def test_exhaustive_query_index_honors_allowed(spark, corpus, tmp_path):
    """query_index(use_wand=False, allowed=...) applies the filter (round-5
    ADVICE medium: it was silently ignored) — rank- and score-identical to
    the WAND path under the same filter."""
    from bliss_rs_spark.plans.lifecycle import build_full, query_index
    from bliss_rs_spark.sources.index_store import IndexStore

    docs, _, _, _ = corpus
    store = IndexStore(str(tmp_path / "idx_exh"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    want = query_index(spark, store, QUERY, 15, use_wand=True, allowed=allowed).collect()
    got = query_index(spark, store, QUERY, 15, use_wand=False, allowed=allowed).collect()
    assert want, "vacuous filter"
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)
    assert all(r["doc_id"] % 3 == 0 for r in got)


def test_phrase_filter_never_collects_raw_ids(spark, corpus):
    """set_filter's driver traffic is ENCODED per-shard blobs only (round-5
    verdict #2): the allow frame itself is never collected / toPandas'd,
    and the broadcast payload is {shard: encoded bytes}."""
    from bliss_rs_spark.operators.phrase import PhraseServer, build_positional_postings

    docs, _, _, _ = corpus
    pos = build_positional_postings(docs, CFG)
    srv = PhraseServer(spark, pos, CFG, packed=True)
    try:
        allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")

        def boom(*a, **k):
            raise AssertionError(
                "allow frame materialized raw on the driver — set_filter "
                "must collect only encoded per-shard blobs"
            )

        allowed.collect = boom
        allowed.toPandas = boom
        allowed.toLocalIterator = boom
        srv.set_filter("thirds", allowed)
        payload = srv._filters["thirds"][0].value
        assert isinstance(payload, dict) and payload
        assert all(
            isinstance(s, int) and isinstance(b, bytes)
            for s, b in payload.items()
        )
        # and it still constrains exactly
        phrase = "posting block codec"
        got = srv.query(phrase, 1_000_000, filter_name="thirds")
        assert got and all(d % 3 == 0 for d, _ in got)
    finally:
        srv.close()


def test_phrase_filter_deny_mode(spark, corpus):
    """Complement route (round-5 verdict #2): a NON-selective predicate
    registers its small complement with mode='deny' — results identical to
    the equivalent allow filter, but driver/broadcast traffic sizes by the
    excluded side."""
    from bliss_rs_spark.operators.phrase import PhraseServer, build_positional_postings

    docs, _, _, _ = corpus
    pos = build_positional_postings(docs, CFG)
    srv = PhraseServer(spark, pos, CFG, packed=True)
    try:
        keep_pred = F.col("doc_id") % 3 != 0  # "non-selective": keeps 2/3
        srv.set_filter("most", docs.filter(keep_pred).select("doc_id"))
        srv.set_filter(
            "most_deny", docs.filter(~keep_pred).select("doc_id"), mode="deny"
        )
        phrase = "posting block codec"
        via_allow = srv.query(phrase, 1_000_000, filter_name="most")
        via_deny = srv.query(phrase, 1_000_000, filter_name="most_deny")
        assert via_allow == via_deny and via_deny, "vacuous"
        assert all(d % 3 != 0 for d, _ in via_deny)
        # proximity path rides the same mode
        w_allow = srv.query_window("codec posting", 1_000_000, filter_name="most")
        w_deny = srv.query_window(
            "codec posting", 1_000_000, filter_name="most_deny"
        )
        assert w_allow == w_deny and w_deny
        with pytest.raises(ValueError, match="mode"):
            srv.set_filter("bad", docs.select("doc_id"), mode="nope")
    finally:
        srv.close()
