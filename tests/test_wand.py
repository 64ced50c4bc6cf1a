"""Packed index + block-max WAND correctness: rank-identical to BOTH the
exhaustive Spark scorer and the pure-Python oracle — the reference's
"two decoders, one contract" invariant (/root/reference/src/song/mod.rs:
636-689) applied to two query execution strategies."""

import pytest

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.functions.codec import decode_doc_ids, varbyte_decode
from bliss_rs_spark.operators.bm25 import bm25_topk
from bliss_rs_spark.operators.build_index import build_index_frames
from bliss_rs_spark.operators.pack import build_packed_index
from bliss_rs_spark.operators.wand import wand_topk
from tests.oracle import OracleIndex

N_DOCS = 400

QUERIES = [
    ("blockMaxScore", 10),
    ("return", 10),            # hot term -> exercises the salted path
    ("varbyte encode merge", 10),
    ("rareNeedle3", 5),
    ("posting_block_codec shard buffer cursor", 50),
    ("zzz_not_in_corpus", 10),
    ("delta", 1),
    ("return value data", 25),  # all three forced-hot terms together
]


@pytest.fixture(scope="module")
def packed_corpus(spark):
    cfg = IndexConfig(block_size=16, n_doc_shards=8)  # small blocks: force skipping
    docs = with_invariants(synth_documents(spark, N_DOCS, seed=42)).cache()
    idx = build_index_frames(docs, cfg)
    packed = build_packed_index(idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg).cache()
    packed.count()
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    rows = docs.select("doc_id", "lang", "content").collect()
    oracle = OracleIndex([r.asDict() for r in rows])
    return cfg, idx, packed, oracle


@pytest.mark.parametrize("text,k", QUERIES, ids=[q[0] for q in QUERIES])
def test_wand_matches_oracle_and_exhaustive(spark, packed_corpus, text, k):
    cfg, idx, packed, oracle = packed_corpus
    got = wand_topk(spark, packed, idx.term_stats, idx.avgdl, text, k, cfg).collect()
    expected = oracle.topk(text, k)
    assert [r["doc_id"] for r in got] == [d for d, _ in expected], text
    for r, (_, es) in zip(got, expected):
        assert abs(r["score"] - es) <= 1e-9 * max(1.0, abs(es))

    exh = bm25_topk(spark, idx.postings, idx.term_stats, idx.avgdl, text, k, cfg).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exh]


def test_wand_batch_matches_oracle(spark, packed_corpus):
    """Batched WAND (one job, all queries) must equal per-query results."""
    from bliss_rs_spark.operators.wand import wand_topk_batch

    cfg, idx, packed, oracle = packed_corpus
    queries = [(i + 1, text, k) for i, (text, k) in enumerate(QUERIES)]
    res = wand_topk_batch(spark, packed, idx.term_stats, idx.avgdl, queries, cfg).collect()
    by_qid = {}
    for r in res:
        by_qid.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, text, k in queries:
        expected = oracle.topk(text, k)
        got = sorted(by_qid.get(qid, []))
        assert [g[1] for g in got] == [d for d, _ in expected], text
        for (_, _, gs), (_, es) in zip(got, expected):
            assert abs(gs - es) <= 1e-9 * max(1.0, abs(es))


def test_packed_roundtrip_postings(spark, packed_corpus):
    """Decompressing every block must reproduce the flat postings exactly."""
    cfg, idx, packed, oracle = packed_corpus
    flat = {}
    for row in packed.collect():
        for bl in row["blocks"]:
            docs = decode_doc_ids(bl["docs"])
            tfs = varbyte_decode(bl["tfs"])
            dls = varbyte_decode(bl["dls"])
            assert list(docs) == sorted(docs), "doc_ids sorted within block"
            assert bl["first_doc"] == docs[0] and bl["last_doc"] == docs[-1]
            assert bl["n"] == len(docs)
            for d, tf, dl in zip(docs, tfs, dls):
                flat[(row["term"], int(d))] = (int(tf), int(dl))
    expected = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in idx.postings.collect()
    }
    assert flat == expected


def test_packed_deterministic_rebuild(spark, packed_corpus):
    """Same corpus -> byte-identical packed blocks (resumability invariant)."""
    cfg, idx, packed, _ = packed_corpus
    again = build_packed_index(idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg)

    def canon(df):
        out = {}
        for row in df.collect():
            out[(row["shard"], row["term"])] = (
                row["df_shard"],
                tuple(
                    (b["first_doc"], b["last_doc"], b["n"], b["max_tsc"],
                     bytes(b["docs"]), bytes(b["tfs"]), bytes(b["dls"]))
                    for b in row["blocks"]
                ),
            )
        return out

    assert canon(packed) == canon(again)


def test_salting_engaged(spark, packed_corpus):
    """Hot terms must produce multiple stage-1 runs (the salted path)."""
    cfg, idx, packed, oracle = packed_corpus
    hot_df = oracle.df["return"]
    assert hot_df >= cfg.hot_term_df_ratio * oracle.n_docs  # fixture sanity
    # shard-local df of a hot term must still round-trip to the global df
    total = sum(
        r["df_shard"] for r in packed.filter("term = 'return'").collect()
    )
    assert total == hot_df


def test_grouped_and_sorted_pack_identical(spark, packed_corpus):
    """The sort-based mapInPandas pack and the two-stage salted groupBy pack
    must produce byte-identical indexes (two physical strategies, one logical
    contract — the decoder-agnosticism pattern again)."""
    from bliss_rs_spark.operators.pack import build_packed_index_grouped

    cfg, idx, packed, _ = packed_corpus
    grouped = build_packed_index_grouped(
        idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg
    )

    def canon(df):
        return {
            (r["shard"], r["term"]): (
                r["df_shard"],
                tuple(
                    (b["first_doc"], b["last_doc"], b["n"], b["max_tsc"],
                     bytes(b["docs"]), bytes(b["tfs"]), bytes(b["dls"]))
                    for b in r["blocks"]
                ),
            )
            for r in df.collect()
        }

    assert canon(packed) == canon(grouped)


def test_ordinal_index_matches_and_shrinks(spark, packed_corpus):
    """Ordinal-compressed packed index: identical WAND results via the doc
    map, and strictly fewer posting bytes than raw xxhash64 doc_ids."""
    from bliss_rs_spark.operators.pack import build_packed_index_full

    cfg, idx, packed_raw, oracle = packed_corpus
    cfg_ord = IndexConfig(
        block_size=cfg.block_size, n_doc_shards=cfg.n_doc_shards, ordinal_docids=True
    )
    packed_ord, doc_map = build_packed_index_full(
        idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg_ord
    )
    packed_ord = packed_ord.cache()
    doc_map = doc_map.cache()

    for text, k in QUERIES[:5]:
        got = wand_topk(
            spark, packed_ord, idx.term_stats, idx.avgdl, text, k, cfg_ord,
            doc_map=doc_map,
        ).collect()
        expected = oracle.topk(text, k)
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], text
        for r, (_, es) in zip(got, expected):
            assert abs(r["score"] - es) <= 1e-9 * max(1.0, abs(es))

    def doc_bytes(df):
        return sum(
            len(bytes(b["docs"])) for row in df.collect() for b in row["blocks"]
        )

    raw_b, ord_b = doc_bytes(packed_raw), doc_bytes(packed_ord)
    map_b = sum(len(bytes(r["doc_ids"])) for r in doc_map.collect())
    assert ord_b < 0.5 * raw_b, (raw_b, ord_b)
    # even including the map, the ordinal layout must win
    assert ord_b + map_b < raw_b, (raw_b, ord_b, map_b)


def test_compression_ratio(spark, packed_corpus):
    cfg, idx, packed, _ = packed_corpus
    n_postings = idx.postings.count()
    packed_bytes = 0
    for row in packed.collect():
        for b in row["blocks"]:
            packed_bytes += len(b["docs"]) + len(b["tfs"]) + len(b["dls"])
    # flat layout is ~20 B/posting (8B doc + 4B tf + 4B dl + term key overhead)
    assert packed_bytes / n_postings < 14.0
