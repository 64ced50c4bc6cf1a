"""End-to-end BM25 correctness vs the pure-Python oracle — the golden-vector
test of the reference (pinned 23-float analysis at 1e-5,
/root/reference/src/song/mod.rs:553-591): here we pin rank-identical top-k
doc_ids and scores at 1e-9 on a frozen synthetic corpus."""

import pytest

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.operators.bm25 import bm25_topk, bm25_topk_batch, query_terms
from bliss_rs_spark.operators.build_index import build_index_frames
from tests.oracle import OracleIndex

N_DOCS = 400

QUERIES = [
    (1, "blockMaxScore", 10),          # camelCase: only matches via sub-token split
    (2, "return", 10),                 # forced-hot keyword (skew)
    (3, "varbyte encode merge", 10),   # multi-term conjunction-ish
    (4, "rareNeedle3", 5),             # rare identifier
    (5, "posting_block_codec shard", 100),
    (6, "zzz_not_in_corpus", 10),      # no hits
    (7, "delta", 1),                   # k=1 edge
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_invariants(synth_documents(spark, N_DOCS, seed=42)).cache()
    idx = build_index_frames(docs, IndexConfig())
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    rows = docs.select("doc_id", "lang", "content").collect()
    oracle = OracleIndex([r.asDict() for r in rows])
    return idx, oracle


def _assert_topk_matches(got_rows, expected, tol=1e-9):
    got = [(r["doc_id"], r["score"]) for r in got_rows]
    assert [g[0] for g in got] == [e[0] for e in expected], "rank-identical doc_ids"
    for (gd, gs), (ed, es) in zip(got, expected):
        assert abs(gs - es) <= tol * max(1.0, abs(es)), (gd, gs, es)


@pytest.mark.parametrize("qid,text,k", QUERIES, ids=[q[1] for q in QUERIES])
def test_topk_matches_oracle(spark, corpus, qid, text, k):
    idx, oracle = corpus
    got = bm25_topk(spark, idx.postings, idx.term_stats, idx.avgdl, text, k).collect()
    expected = oracle.topk(text, k)
    _assert_topk_matches(got, expected)


def test_batch_topk_matches_oracle(spark, corpus):
    idx, oracle = corpus
    res = bm25_topk_batch(
        spark, idx.postings, idx.term_stats, idx.avgdl, QUERIES
    ).collect()
    by_qid = {}
    for r in res:
        by_qid.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, text, k in QUERIES:
        expected = oracle.topk(text, k)
        got = sorted(by_qid.get(qid, []))
        assert [g[1] for g in got] == [e[0] for e in expected], text
        for (_, _, gs), (_, es) in zip(got, expected):
            assert abs(gs - es) <= 1e-9 * max(1.0, abs(es))


def test_stats_match_oracle(spark, corpus):
    idx, oracle = corpus
    assert idx.n_docs == oracle.n_docs
    assert abs(idx.avgdl - oracle.avgdl) < 1e-9
    ts = {r["term"]: (r["df"], r["idf"]) for r in idx.term_stats.collect()}
    assert set(ts.keys()) == set(oracle.df.keys())
    for t, (df, idf) in ts.items():
        assert df == oracle.df[t], t
        assert abs(idf - oracle.idf(t)) < 1e-12, t


def test_query_terms_same_analyzer():
    # query analyzer == document analyzer (reference: same decoder contract)
    assert query_terms("parseHtmlDocument fooBar") == ["bar", "document", "foo", "html", "parse"]
