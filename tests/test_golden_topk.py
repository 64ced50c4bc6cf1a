"""Frozen golden top-k tests — the pinned 23-float analysis vector of the
reference (/root/reference/src/song/mod.rs:553-591) applied to retrieval:
both query strategies must reproduce the checked-in (query, rank, doc_id,
score) table on the frozen seed-42 corpus, scores within 1e-6, ranks exact.

If the tokenizer spec or BM25 constants ever change, this test fails loudly —
bump IndexConfig.analyzer_version and regenerate the fixture deliberately
(generation recipe in tests/data/golden_topk.json's git history)."""

import json
import os

import pytest

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.operators.bm25 import bm25_topk
from bliss_rs_spark.operators.build_index import build_index_frames
from bliss_rs_spark.operators.pack import build_packed_index
from bliss_rs_spark.operators.wand import wand_topk

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "golden_topk.json")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def built(spark, golden):
    cfg = IndexConfig(block_size=16, n_doc_shards=8)
    docs = with_invariants(
        synth_documents(spark, golden["corpus"]["n_docs"], seed=golden["corpus"]["seed"])
    )
    idx = build_index_frames(docs, cfg)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    packed = build_packed_index(idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg).cache()
    packed.count()
    return cfg, idx, packed


def _expected(golden, qid):
    return [
        (g["doc_id"], g["score"])
        for g in sorted(
            (g for g in golden["golden_topk"] if g["query_id"] == qid),
            key=lambda g: g["rank"],
        )
    ]


def test_golden_pinned(spark, golden, built):
    cfg, idx, packed = built
    for q in golden["queries"]:
        exp = _expected(golden, q["query_id"])
        for name, got in (
            ("exhaustive", bm25_topk(spark, idx.postings, idx.term_stats, idx.avgdl,
                                     q["query_text"], q["k"], cfg).collect()),
            ("wand", wand_topk(spark, packed, idx.term_stats, idx.avgdl,
                               q["query_text"], q["k"], cfg).collect()),
        ):
            assert [r["doc_id"] for r in got] == [d for d, _ in exp], (name, q["query_text"])
            for r, (_, es) in zip(got, exp):
                assert abs(r["score"] - es) <= 1e-6 * max(1.0, abs(es)), (name, q["query_text"])
