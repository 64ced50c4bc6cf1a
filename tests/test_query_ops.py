"""Boolean / prefix / fuzzy / more-like-this retrieval: semantics vs a
Python brute-force BM25 on a hand-built corpus, plus edge cases (missing
must term, empty expansion, seed exclusion)."""

import math

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.operators.build_index import build_index_frames
from bliss_rs_spark.operators.query_ops import (
    boolean_topk,
    expand_fuzzy,
    expand_prefix,
    fuzzy_topk,
    more_like_this,
    prefix_topk,
)

TEXTS = [
    "merge sort beats bubble sort on big tables",
    "hash join and merge join walk into a table",
    "the table scans twice under a slow filter",
    "spark shuffles the hash partitions into sorted runs",
    "merge merge merge conflict in the join path",
    "a vector index answers the nearest neighbor query",
]
CFG = IndexConfig()


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (f"r{i}", f"f{i}.txt", "c" * 40, "en", t) for i, t in enumerate(TEXTS)
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    ix = build_index_frames(docs, CFG)
    ix.postings = ix.postings.cache()
    ix.term_stats = ix.term_stats.cache()
    # doc_id ordinal map for brute-force comparison
    ids = {
        r["path"]: r["doc_id"]
        for r in ix.doc_stats.select("path", "doc_id").collect()
    }
    ix._test_ids = [ids[f"f{i}.txt"] for i in range(len(TEXTS))]
    return ix


def _doc_term_counts():
    from bliss_rs_spark.functions.tokenizer import term_counts

    return [term_counts(t, None, CFG.lang_tagging) for t in TEXTS]


def _brute_bm25(idx, terms, doc_filter=lambda i: True):
    """Python replay: per-doc BM25 sum over `terms` using the SAME analyzer."""
    docs_terms = _doc_term_counts()
    n = len(TEXTS)
    dls = [sum(tc.values()) for tc in docs_terms]
    avgdl = sum(dls) / n
    df = {}
    for tc in docs_terms:
        for term in tc:
            df[term] = df.get(term, 0) + 1
    scores = {}
    for i, tc in enumerate(docs_terms):
        if not doc_filter(i):
            continue
        s = 0.0
        for term in terms:
            if term not in tc or term not in df:
                continue
            idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            tf = float(tc[term])
            s += idf * tf * (CFG.k1 + 1.0) / (
                tf + CFG.k1 * (1.0 - CFG.b + CFG.b * dls[i] / avgdl)
            )
        if s > 0:
            scores[i] = s
    return scores


def _got(df_out, idx):
    inv = {d: i for i, d in enumerate(idx._test_ids)}
    return [(inv[r["doc_id"]], round(r["score"], 9)) for r in df_out.collect()]


def test_boolean_must_filters(spark, idx):
    out = _got(
        boolean_topk(
            spark, idx.postings, idx.term_stats, idx.avgdl,
            must="merge", should="sort", k=10, cfg=CFG,
        ),
        idx,
    )
    tcs = _doc_term_counts()
    want = _brute_bm25(idx, ["merge", "sort"], lambda i: "merge" in tcs[i])
    assert {i for i, _ in out} == set(want)
    for i, s in out:
        assert s == pytest.approx(want[i], rel=1e-9)


def test_boolean_must_not_excludes(spark, idx):
    out = _got(
        boolean_topk(
            spark, idx.postings, idx.term_stats, idx.avgdl,
            must="table", must_not="slow", k=10, cfg=CFG,
        ),
        idx,
    )
    hit = {i for i, _ in out}
    assert 2 not in hit  # has 'slow'
    tcs = _doc_term_counts()
    assert hit == {
        i for i, tc in enumerate(tcs) if "table" in tc and "slow" not in tc
    }


def test_boolean_missing_must_term_empty(spark, idx):
    out = boolean_topk(
        spark, idx.postings, idx.term_stats, idx.avgdl,
        must="xyzzy merge", k=10, cfg=CFG,
    )
    assert out.count() == 0


def test_boolean_no_terms_empty(spark, idx):
    out = boolean_topk(spark, idx.postings, idx.term_stats, idx.avgdl, cfg=CFG)
    assert out.count() == 0


def test_prefix_expansion_and_scores(spark, idx):
    exp = {r["term"] for r in expand_prefix(idx.term_stats, "so").collect()}
    assert exp == {"sort", "sorted"}
    out = _got(
        prefix_topk(spark, idx.postings, idx.term_stats, idx.avgdl, "so", 10, CFG),
        idx,
    )
    want = _brute_bm25(idx, ["sort", "sorted"])
    assert {i for i, _ in out} == set(want)
    for i, s in out:
        assert s == pytest.approx(want[i], rel=1e-9)


def test_prefix_no_match_empty(spark, idx):
    out = prefix_topk(spark, idx.postings, idx.term_stats, idx.avgdl, "zzz", 10, CFG)
    assert out.count() == 0


def test_fuzzy_expansion(spark, idx):
    exp = {r["term"] for r in expand_fuzzy(idx.term_stats, "jion", 2).collect()}
    assert "join" in exp  # the typo the operator exists for
    out = _got(
        fuzzy_topk(spark, idx.postings, idx.term_stats, idx.avgdl, "jion", 10, 2, CFG),
        idx,
    )
    want = _brute_bm25(idx, sorted(exp))
    assert {i for i, _ in out} == set(want)
    for i, s in out:
        assert s == pytest.approx(want[i], rel=1e-9)


def test_more_like_this_excludes_seed(spark, idx):
    seed = idx._test_ids[4]  # the merge-heavy doc
    out = more_like_this(
        spark, idx.postings, idx.term_stats, idx.avgdl, seed, k=10, top_terms=3, cfg=CFG
    )
    ids = [r["doc_id"] for r in out.collect()]
    assert seed not in ids
    assert ids, "vacuous: MLT found nothing similar"
    # merge/join-heavy neighbors should surface
    inv = {d: i for i, d in enumerate(idx._test_ids)}
    assert inv[ids[0]] in {0, 1}

def test_symspell_index_equals_scan(spark, idx):
    """The deletion-variant (SymSpell) fuzzy index expands EXACTLY like the
    vocab scan, for d=1 and d=2 across assorted typos."""
    from bliss_rs_spark.operators.query_ops import (
        build_deletion_variants,
        expand_fuzzy,
        expand_fuzzy_indexed,
    )

    for d in (1, 2):
        var = build_deletion_variants(idx.term_stats, max_dist=d).cache()
        for q in ["jion", "merge", "tabl", "srot", "xyz", "a", "hashh"]:
            scan = {
                (r["term"], round(r["idf"], 12))
                for r in expand_fuzzy(idx.term_stats, q, d).collect()
            }
            indexed = {
                (r["term"], round(r["idf"], 12))
                for r in expand_fuzzy_indexed(var, q, d).collect()
            }
            assert indexed == scan, (d, q)
        var.unpersist()
    # non-vacuity: d=2 must expand something for the transposed typo
    var = build_deletion_variants(idx.term_stats, max_dist=2)
    got = {r["term"] for r in expand_fuzzy_indexed(var, "jion", 2).collect()}
    assert "join" in got


def test_symspell_variant_pushdown(spark, idx, tmp_path):
    """Against a STORED variants table, the query's variant isin reaches the
    parquet scan as a pushed filter."""
    from bliss_rs_spark.operators.query_ops import (
        build_deletion_variants,
        expand_fuzzy_indexed,
    )

    p = str(tmp_path / "variants.parquet")
    build_deletion_variants(idx.term_stats, max_dist=1).write.parquet(p)
    stored = spark.read.parquet(p)
    plan = (
        expand_fuzzy_indexed(stored, "jion", 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(variant" in plan
