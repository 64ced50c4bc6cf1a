"""Lang-tagged term mode: terms are indexed as "<lang>:<term>" so queries
scope to one language's sub-corpus (the graft spec's lang-tagged terms).
End-to-end: build with lang_tagging=True, query with lang=..., pin to the
oracle running in the same mode."""

import pytest

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.operators.bm25 import bm25_topk, query_terms
from bliss_rs_spark.operators.build_index import build_index_frames
from tests.oracle import OracleIndex

CFG = IndexConfig(lang_tagging=True, n_term_buckets=8)


@pytest.fixture(scope="module")
def tagged(spark):
    docs = with_invariants(synth_documents(spark, 300, seed=42)).cache()
    idx = build_index_frames(docs, CFG)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    rows = docs.select("doc_id", "lang", "content").collect()
    oracle = OracleIndex([r.asDict() for r in rows], lang_tagging=True)
    langs = {r["doc_id"]: r["lang"] for r in rows}
    return idx, oracle, langs


def test_query_terms_tagged():
    assert query_terms("fooBar", "Rust", CFG) == ["rust:bar", "rust:foo"]


def test_lang_scoped_results(spark, tagged):
    idx, oracle, langs = tagged
    # "return" exists in every language; a rust-scoped query must only
    # return rust docs, rank-identical to the tagged oracle
    got = bm25_topk(spark, idx.postings, idx.term_stats, idx.avgdl,
                    "return", 10, CFG, lang="rust").collect()
    assert got, "rust-scoped query returned nothing"
    assert all(langs[r["doc_id"]] == "rust" for r in got)

    exp_terms = ["rust:return"]
    scored = []
    for doc_id in oracle.tf:
        s = oracle.score(doc_id, exp_terms)
        if s > 0:
            scored.append((doc_id, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    assert [r["doc_id"] for r in got] == [d for d, _ in scored[:10]]


def test_cross_lang_isolation(spark, tagged):
    idx, oracle, langs = tagged
    per_lang = {}
    for lang in ("rust", "python", "go"):
        got = bm25_topk(spark, idx.postings, idx.term_stats, idx.avgdl,
                        "return value", 5, CFG, lang=lang).collect()
        per_lang[lang] = [r["doc_id"] for r in got]
        assert all(langs[d] == lang for d in per_lang[lang])
    # result sets are disjoint across languages
    all_docs = sum(per_lang.values(), [])
    assert len(all_docs) == len(set(all_docs))


def test_untagged_query_finds_nothing_in_tagged_index(spark, tagged):
    idx, _, _ = tagged
    got = bm25_topk(spark, idx.postings, idx.term_stats, idx.avgdl,
                    "return", 5, IndexConfig(lang_tagging=False, n_term_buckets=8)).collect()
    assert got == []  # plain "return" != "rust:return": version-mix refused by construction
