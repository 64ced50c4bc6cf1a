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


def test_suffix_expansion_and_scores(spark, idx):
    from bliss_rs_spark.operators.query_ops import expand_suffix, suffix_topk

    exp = {r["term"] for r in expand_suffix(idx.term_stats, "le").collect()}
    assert "table" in exp and all(t.endswith("le") for t in exp)
    out = _got(
        suffix_topk(spark, idx.postings, idx.term_stats, idx.avgdl, "le", 10, CFG),
        idx,
    )
    want = _brute_bm25(idx, sorted(exp))
    assert {i for i, _ in out} == set(want)
    for i, s in out:
        assert s == pytest.approx(want[i], rel=1e-9)


def test_reversed_terms_index_equals_scan(spark, idx):
    """The reversed-term dictionary expands EXACTLY like the endswith scan,
    and against a STORED dictionary the reversed prefix is a pushed filter."""
    from bliss_rs_spark.operators.query_ops import (
        build_reversed_terms,
        expand_suffix,
        expand_suffix_indexed,
    )

    rt = build_reversed_terms(idx.term_stats).cache()
    for sfx in ["le", "rt", "e", "join", "zzz"]:
        scan = {
            (r["term"], round(r["idf"], 12))
            for r in expand_suffix(idx.term_stats, sfx).collect()
        }
        indexed = {
            (r["term"], round(r["idf"], 12))
            for r in expand_suffix_indexed(rt, sfx).collect()
        }
        assert indexed == scan, sfx
    rt.unpersist()


def test_reversed_terms_pushdown(spark, idx, tmp_path):
    from bliss_rs_spark.operators.query_ops import (
        build_reversed_terms,
        expand_suffix_indexed,
    )

    p = str(tmp_path / "rterms.parquet")
    build_reversed_terms(idx.term_stats).write.parquet(p)
    stored = spark.read.parquet(p)
    plan = (
        expand_suffix_indexed(stored, "le")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StartsWith(rterm" in plan


def test_collapse_topk_caps_per_key(spark, idx):
    """Collapse by a 2-value key: no key exceeds per_key, survivors are each
    key's best by (score DESC, doc_id ASC), and scores match brute force."""
    from bliss_rs_spark.operators.query_ops import collapse_topk

    # docs 0-2 -> key 'x', docs 3-5 -> key 'y'
    keys = spark.createDataFrame(
        [(d, "x" if i < 3 else "y") for i, d in enumerate(idx._test_ids)],
        "doc_id long, key string",
    )
    out = collapse_topk(
        spark, idx.postings, idx.term_stats, idx.avgdl,
        "merge join table", keys, k=10, per_key=1, cfg=CFG,
    ).collect()
    assert len(out) == 2 and {r["key"] for r in out} == {"x", "y"}
    want = _brute_bm25(idx, ["merge", "join", "table"])
    inv = {d: i for i, d in enumerate(idx._test_ids)}
    for r in out:
        i = inv[r["doc_id"]]
        group = range(0, 3) if r["key"] == "x" else range(3, 6)
        best = max((want.get(j, 0.0), -j) for j in group)
        assert (want[i], -i) == best
        assert r["score"] == pytest.approx(want[i], rel=1e-9)


def test_search_after_pages_concatenate(spark, idx):
    """Cursor pages concatenate to exactly the single top-N run (total-order
    keyset pagination), and the pages are disjoint."""
    from bliss_rs_spark.operators.query_ops import search_after

    args = (spark, idx.postings, idx.term_stats, idx.avgdl, "the a merge join vector")
    full = search_after(*args, k=6, cfg=CFG).collect()
    assert len(full) == 6, "vacuous: corpus must fill both pages"
    p1 = search_after(*args, k=3, cfg=CFG).collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    p2 = search_after(*args, k=3, after=cursor, cfg=CFG).collect()
    got = [(r["doc_id"], round(r["score"], 9)) for r in p1 + p2]
    want = [(r["doc_id"], round(r["score"], 9)) for r in full]
    assert got == want
    assert len({d for d, _ in got}) == 6
