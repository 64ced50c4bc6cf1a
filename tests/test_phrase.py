"""Positional postings + phrase query unit tests vs a pure-Python oracle."""

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.functions.tokenizer import tokenize_text
from bliss_rs_spark.operators.phrase import build_positional_postings, phrase_match, phrase_topk

CFG = IndexConfig(n_term_buckets=8)


def _oracle_phrase_tf(content: str, phrase: str) -> int:
    toks = tokenize_text(content)
    p = tokenize_text(phrase)
    if not p or len(toks) < len(p):
        return 0
    return sum(1 for i in range(len(toks) - len(p) + 1) if toks[i : i + len(p)] == p)


@pytest.fixture(scope="module")
def positional(spark):
    docs = with_invariants(synth_documents(spark, 250, seed=42)).cache()
    pos = build_positional_postings(docs, CFG).cache()
    pos.count()
    rows = docs.select("doc_id", "content").collect()
    return pos, {r["doc_id"]: r["content"] for r in rows}


@pytest.mark.parametrize(
    "phrase",
    [
        "fast merge",                 # common bigram
        "block max score",            # camelCase-derived trigram
        "posting block codec",        # snake_case-derived trigram
        "return return",              # duplicated term in the phrase
        "zzz yyy xxx",                # no match
        "buffer",                     # single-term phrase == term match
    ],
)
def test_phrase_matches_oracle(spark, positional, phrase):
    pos, contents = positional
    got = {r["doc_id"]: r["phrase_tf"] for r in phrase_match(spark, pos, phrase, CFG).collect()}
    exp = {}
    for doc_id, content in contents.items():
        tf = _oracle_phrase_tf(content, phrase)
        if tf > 0:
            exp[doc_id] = tf
    assert got == exp, phrase


def test_phrase_topk_ordering(spark, positional):
    pos, contents = positional
    rows = phrase_topk(spark, pos, "fast merge", k=5, cfg=CFG).collect()
    tfs = [r["phrase_tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    # ties broken by ascending doc_id
    for a, b in zip(rows, rows[1:]):
        if a["phrase_tf"] == b["phrase_tf"]:
            assert a["doc_id"] < b["doc_id"]


def test_positional_agrees_with_bag_of_words(spark, positional):
    """Positional tf must equal the pandas-UDF tokenizer's tf for every
    (term, doc) — two tokenizer implementations, one spec."""
    pos, contents = positional
    from bliss_rs_spark.operators.build_index import tokenize_documents

    docs = with_invariants(synth_documents(spark, 250, seed=42))
    bag = (
        tokenize_documents(docs, CFG)
        .select("doc_id", F.explode(F.arrays_zip("terms", "tfs")).alias("t"))
        .select("doc_id", F.col("t.terms").alias("term"), F.col("t.tfs").alias("tf"))
    )
    a = {(r["term"], r["doc_id"]): r["tf"] for r in bag.collect()}
    b = {(r["term"], r["doc_id"]): r["tf"] for r in pos.select("term", "doc_id", "tf").collect()}
    assert a == b


def test_phrase_over_segment_store_with_tombstones(spark, tmp_path):
    """Phrase queries read the positional VIEW (segment union + tombstone
    anti-filter): after a segment-mode update with changed + deleted docs,
    results equal a from-scratch positional build of the live corpus."""
    from dataclasses import replace

    from bliss_rs_spark.plans.lifecycle import build_full, phrase_query, update_index
    from bliss_rs_spark.sources.index_store import IndexStore

    cfg = replace(CFG, store_positions=True)
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 150, seed=42))
    build_full(spark, docs, store, cfg, checkpoint=False)

    docs_b = with_invariants(
        with_invariants(synth_documents(spark, 170, seed=42)).withColumn(
            "content",
            F.when(F.col("doc_id") % 8 == 0,
                   F.concat(F.lit("block max score intro\n"), F.col("content")))
            .otherwise(F.col("content")),
        ).drop("doc_id", "content_sha256")
    ).filter(F.col("doc_id") % 19 != 4)
    update_index(spark, docs_b, store, None, delete_missing=True, repack="segment")

    fresh = IndexStore(str(tmp_path / "fresh"))
    build_full(spark, docs_b, fresh, cfg, checkpoint=False)
    for phrase in ["block max score", "fast merge"]:
        got = {(r["doc_id"], r["phrase_tf"])
               for r in phrase_query(spark, store, phrase, 25).collect()}
        exp = {(r["doc_id"], r["phrase_tf"])
               for r in phrase_query(spark, fresh, phrase, 25).collect()}
        assert got == exp, phrase


def test_phrase_server_rank_identical(spark, positional):
    """PhraseServer (one shuffle-free job) == phrase_topk (batch path),
    rank-for-rank including duplicate-term phrases and misses."""
    from bliss_rs_spark.operators.phrase import PhraseServer

    pos, _ = positional
    server = PhraseServer(spark, pos, CFG)
    try:
        for phrase in [
            "fast merge", "block max score", "return return",
            "zzz yyy xxx", "buffer",
        ]:
            got = server.query(phrase, 10)
            exp = [
                (int(r["doc_id"]), int(r["phrase_tf"]))
                for r in phrase_topk(spark, pos, phrase, 10, CFG).collect()
            ]
            assert got == exp, phrase
        assert server.query("", 10) == []
    finally:
        server.close()


def test_phrase_server_over_churned_store(spark, tmp_path):
    """from_store serves the tombstone-filtered positional view: identical
    to the batch phrase_query after segment updates + deletions."""
    from dataclasses import replace

    from bliss_rs_spark.operators.phrase import PhraseServer
    from bliss_rs_spark.plans.lifecycle import build_full, phrase_query, update_index
    from bliss_rs_spark.sources.index_store import IndexStore

    cfg = replace(CFG, store_positions=True)
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 120, seed=7))
    build_full(spark, docs, store, cfg, checkpoint=False)
    update_index(
        spark,
        docs.filter(F.col("doc_id") % 9 != 0),
        store, None, delete_missing=True, repack="segment",
    )
    server = PhraseServer.from_store(spark, store)
    try:
        for phrase in ["fast merge", "block max"]:
            got = server.query(phrase, 15)
            exp = [
                (int(r["doc_id"]), int(r["phrase_tf"]))
                for r in phrase_query(spark, store, phrase, 15).collect()
            ]
            assert got == exp, phrase
    finally:
        server.close()

    # a store built without positions must refuse serving, same as the
    # batch path
    bare = IndexStore(str(tmp_path / "bare"))
    build_full(spark, docs, bare, CFG, checkpoint=False)
    with pytest.raises(ValueError, match="without positions"):
        PhraseServer.from_store(spark, bare)


def test_positional_blob_roundtrip():
    """Pure codec check: encode/decode of a (shard, term) positional blob is
    exact for negative doc_ids, singleton docs and long gappy lists."""
    import numpy as np

    from bliss_rs_spark.operators.phrase import (
        decode_positional_blob,
        encode_positional_blob,
    )

    rng = np.random.default_rng(5)
    doc_ids = np.sort(
        rng.choice(2**62, size=40, replace=False).astype(np.int64)
        - 2**61
    )
    lens = rng.integers(1, 9, size=40).astype(np.int64)
    flat = np.concatenate(
        [np.sort(rng.choice(5000, size=n, replace=False)) for n in lens]
    ).astype(np.int64)
    blob = encode_positional_blob(doc_ids, lens, flat)
    d2, l2, f2 = decode_positional_blob(blob)
    assert (d2 == doc_ids).all() and (l2 == lens).all() and (f2 == flat).all()
    # empty blob
    e = encode_positional_blob(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
    )
    d0, l0, f0 = decode_positional_blob(e)
    assert len(d0) == len(l0) == len(f0) == 0


def test_phrase_server_row_mode_identical(spark, positional):
    """packed=False (row kernel) and packed=True (blob kernel) agree with
    each other and with the batch path."""
    from bliss_rs_spark.operators.phrase import PhraseServer

    pos, _ = positional
    rowsrv = PhraseServer(spark, pos, CFG, packed=False)
    pksrv = PhraseServer(spark, pos, CFG, packed=True)
    try:
        for phrase in ["fast merge", "block max score", "return return",
                       "buffer", "zzz yyy xxx"]:
            exp = [
                (int(r["doc_id"]), int(r["phrase_tf"]))
                for r in phrase_topk(spark, pos, phrase, 10, CFG).collect()
            ]
            assert rowsrv.query(phrase, 10) == exp, phrase
            assert pksrv.query(phrase, 10) == exp, phrase
    finally:
        rowsrv.close()
        pksrv.close()


def test_pack_positional_covers_all_rows(spark, positional):
    """The pack is lossless: exploding every blob back yields exactly the
    input (term, doc_id, positions) set."""
    import numpy as np

    from bliss_rs_spark.operators.phrase import (
        decode_positional_blob,
        pack_positional,
    )

    pos, _ = positional
    packed = pack_positional(pos, CFG)
    got = set()
    for r in packed.collect():
        di, lens, flat = decode_positional_blob(bytes(r["pblob"]))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        for i, d in enumerate(di):
            s = int(starts[i])
            got.add((r["term"], int(d),
                     tuple(int(x) for x in flat[s:s + int(lens[i])])))
    exp = {
        (r["term"], int(r["doc_id"]), tuple(int(x) for x in r["positions"]))
        for r in pos.collect()
    }
    assert got == exp


def test_phrase_server_query_batch(spark, positional):
    """query_batch (whole phrase set, one job) == per-phrase query(),
    including phrases with absent terms and empty phrases."""
    from bliss_rs_spark.operators.phrase import PhraseServer

    pos, _ = positional
    phrases = [
        (0, "fast merge", 5),
        (1, "block max score", 10),
        (2, "zzz yyy xxx", 3),
        (3, "return return", 10),
        (4, "", 5),
    ]
    for packed in (True, False):
        server = PhraseServer(spark, pos, CFG, packed=packed)
        try:
            got = server.query_batch(phrases)
            exp = []
            for pid, text, k in phrases:
                for rank, (d, tf) in enumerate(server.query(text, k)):
                    exp.append((pid, rank + 1, d, tf))
            assert got == sorted(exp), f"packed={packed}"
        finally:
            server.close()


def test_from_store_pack_cache_reused(spark, tmp_path):
    """First from_store packs and persists under derived/<snapshot>/;
    later inits read the cache; a new snapshot gets its own cache and the
    served results track the update."""
    import os
    from dataclasses import replace

    from bliss_rs_spark.operators.phrase import PhraseServer
    from bliss_rs_spark.plans.lifecycle import build_full, phrase_query, update_index
    from bliss_rs_spark.sources.index_store import IndexStore

    cfg = replace(CFG, store_positions=True)
    store = IndexStore(str(tmp_path / "idx"))
    docs = with_invariants(synth_documents(spark, 100, seed=31))
    build_full(spark, docs, store, cfg, checkpoint=False)

    s1 = PhraseServer.from_store(spark, store)
    cache1 = os.path.join(store.path, "derived", store.current_snapshot(), "pos_packed")
    assert os.path.isdir(cache1)
    r1 = s1.query("fast merge", 10)
    s1.close()

    # second init must serve from the persisted pack, identically
    s2 = PhraseServer.from_store(spark, store)
    assert s2.query("fast merge", 10) == r1
    s2.close()

    # new snapshot -> new cache key; results reflect the delta
    update_index(
        spark, docs.filter(F.col("doc_id") % 5 != 0), store, None,
        delete_missing=True, repack="segment",
    )
    s3 = PhraseServer.from_store(spark, store)
    cache2 = os.path.join(store.path, "derived", store.current_snapshot(), "pos_packed")
    assert cache2 != cache1 and os.path.isdir(cache2)
    got = s3.query("fast merge", 25)
    exp = [(int(r["doc_id"]), int(r["phrase_tf"]))
           for r in phrase_query(spark, store, "fast merge", 25).collect()]
    assert got == exp
    s3.close()
