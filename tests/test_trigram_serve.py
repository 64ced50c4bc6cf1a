"""Round-6 lead item: warm grep serving across updates (TrigramServer
from_store / refresh) — the trigram tier gets the same lifecycle story the
phrase tier closed in round 5.

Proves:

1. from_store serving equals the batch/brute answer (folded layout, exact
   verify) and caches per-segment packs under derived/tri_units;
2. refresh() after a delta update re-packs ONLY the delta segment —
   fingerprint-unchanged unit caches (and their cached frames) are reused
   verbatim (mtime/inode pins, object identity);
3. deletions flow through refresh() as dead sets: set-identity with the
   brute answer over the retained corpus, no segment rewrites;
4. the serving path holds NO candidate-proportional driver structure (the
   round-5 round-trip is gone): grep never calls the collect-based
   candidates() debug API and its plan semi-joins a distributed frame
   instead of injecting an isin literal list;
5. grep -n (line granularity) matches a per-line Python oracle.
"""

import os

import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.operators.trigram import TrigramServer
from bliss_rs_spark.plans.lifecycle import build_full, update_index
from bliss_rs_spark.sources.index_store import IndexStore

CFG = IndexConfig(store_trigrams=True)
NEEDLE = "return"


@pytest.fixture(scope="module")
def docs(spark):
    d = with_invariants(synth_documents(spark, 200, seed=23)).cache()
    d.count()
    return d


def _brute(docs, needle, fold=False):
    out = set()
    for r in docs.collect():
        c = r["content"]
        if fold:
            c, n = c.lower(), needle.lower()
        else:
            n = needle
        if n in c:
            out.add(r["doc_id"])
    return out


def _brute_lines(docs, needle, fold=False):
    out = []
    for r in docs.collect():
        for i, line in enumerate(r["content"].split("\n")):
            hay = line.lower() if fold else line
            ndl = needle.lower() if fold else needle
            pos = hay.find(ndl)
            if pos >= 0:
                out.append((r["doc_id"], i + 1, pos + 1, line))
    return sorted(out)


def test_from_store_serving_and_refresh_lifecycle(spark, docs, tmp_path):
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    srv = TrigramServer.from_store(spark, store, docs)
    try:
        # 1) exactness through the warm server (case-sensitive over the
        # folded layout + grep -i)
        assert set(srv.grep(NEEDLE)) == _brute(docs, NEEDLE)
        assert set(srv.grep("RETURN", case_insensitive=True)) == _brute(
            docs, "RETURN", fold=True
        )
        # per-segment pack cached under the immutable key
        tri_units = os.path.join(store.path, "derived", "tri_units")
        assert os.path.isdir(tri_units) and len(os.listdir(tri_units)) == 1
        base_key = os.listdir(tri_units)[0]
        base_fp_before = srv._unit_fps.copy()
        base_frame = srv._unit_frames[min(srv._unit_frames)]

        # 2) delta update (new docs) -> refresh re-packs ONLY the delta
        delta = with_invariants(
            synth_documents(spark, 40, seed=99).withColumn(
                "path", F.concat(F.lit("delta/"), F.col("path"))
            )
        )
        all_docs = docs.unionByName(delta).cache()
        all_docs.count()
        update_index(spark, delta, store, CFG, repack="segment")
        info = srv.refresh(store, docs=all_docs)
        assert info["reused_units"] and info["rebuilt_units"]
        base_seq = min(srv._unit_frames)
        assert base_seq in info["reused_units"]
        # the base unit's cache fingerprint and cached FRAME are unchanged
        assert srv._unit_fps[base_seq] == base_fp_before[base_seq]
        assert srv._unit_frames[base_seq] is base_frame
        assert len(os.listdir(tri_units)) == 2  # base + delta, no re-pack
        assert set(srv.grep(NEEDLE)) == _brute(all_docs, NEEDLE)
        # delta docs are actually served
        delta_hits = _brute(delta, NEEDLE)
        assert delta_hits & set(srv.grep(NEEDLE))

        # 3) churn: delete every 5th doc (tombstones only) -> dead sets
        kept = all_docs.filter(F.col("doc_id") % 5 != 0)
        update_index(
            spark, kept, store, CFG, delete_missing=True, repack="segment"
        )
        assert store.has_tombstones(spark)
        n_units_before = len(srv._unit_frames)
        info2 = srv.refresh(store)
        # deletion adds tombstones, not segments: every surviving unit reused
        assert set(info2["reused_units"]) >= {base_seq}
        assert set(srv.grep(NEEDLE)) == _brute(kept, NEEDLE)
        assert len(srv._unit_frames) >= n_units_before  # nothing vanished
        assert base_key in os.listdir(tri_units)
    finally:
        srv.close()
        all_docs.unpersist()


def test_serving_path_holds_no_candidate_list(spark, docs, monkeypatch):
    from bliss_rs_spark.operators.trigram import build_trigram_index

    srv = TrigramServer(
        spark, build_trigram_index(docs, lowercase=True), docs,
        n_doc_shards=4, index_lowercased=True,
    )
    try:
        # grep must never route through the collect-based debug API
        def boom(self, needle):
            raise AssertionError(
                "candidates() collected on a serving path — driver structure "
                "proportional to the candidate set"
            )

        monkeypatch.setattr(TrigramServer, "candidates", boom)
        want = _brute(docs, NEEDLE)
        assert set(srv.grep(NEEDLE)) == want
        # and the verify plan is a semi-join of a distributed frame, not an
        # injected isin literal list
        plan = (
            srv.matches(NEEDLE)._jdf.queryExecution().executedPlan().toString()
        )
        assert "LeftSemi" in plan, plan[:2000]
        assert "doc_id IN (" not in plan.replace("#", " "), plan[:2000]
    finally:
        srv.close()


def test_grep_deterministic_limit(spark, docs):
    from bliss_rs_spark.operators.trigram import build_trigram_index

    srv = TrigramServer(
        spark, build_trigram_index(docs, lowercase=True), docs,
        n_doc_shards=4, index_lowercased=True,
    )
    try:
        full = srv.grep(NEEDLE)
        for _ in range(3):
            assert srv.grep(NEEDLE, limit=5) == full[:5]
    finally:
        srv.close()


def test_grep_lines_matches_python_oracle(spark, docs):
    from bliss_rs_spark.operators.trigram import (
        build_trigram_index,
        substring_search_lines,
    )

    tri = build_trigram_index(docs, lowercase=True).cache()
    srv = TrigramServer(spark, tri, docs, n_doc_shards=4, index_lowercased=True)
    try:
        want = _brute_lines(docs, NEEDLE)
        got = sorted(
            (int(r["doc_id"]), int(r["line_no"]), int(r["col"]), r["line"])
            for r in srv.grep_lines(NEEDLE).collect()
        )
        assert got == want
        # batch path agrees
        got_b = sorted(
            (int(r["doc_id"]), int(r["line_no"]), int(r["col"]), r["line"])
            for r in substring_search_lines(
                docs, tri, NEEDLE, index_lowercased=True
            ).collect()
        )
        assert got_b == want
        # grep -i -n
        want_i = _brute_lines(docs, "RETURN", fold=True)
        got_i = sorted(
            (int(r["doc_id"]), int(r["line_no"]), int(r["col"]), r["line"])
            for r in srv.grep_lines("RETURN", case_insensitive=True).collect()
        )
        assert got_i == want_i
        # line-wise grep cannot match across lines
        with pytest.raises(ValueError, match="newline"):
            srv.grep_lines("a\nb")
    finally:
        srv.close()
        tri.unpersist()


def test_grep_regex_and_gram_budget(spark, docs):
    import re as _re

    from bliss_rs_spark.operators.trigram import build_trigram_index

    srv = TrigramServer(
        spark, build_trigram_index(docs, lowercase=True), docs,
        n_doc_shards=4, index_lowercased=True,
    )
    try:
        any_hit = False
        for pat in [r"return\s+\w+", r"(hash|merge) join", r"def [a-z_]+\("]:
            want = sorted(
                r["doc_id"]
                for r in docs.collect()
                if _re.search(pat, r["content"])
            )
            assert srv.grep_regex(pat) == want, pat
            any_hit = any_hit or bool(want)
        assert any_hit, "vacuous: no regex matched the corpus"
        # rarest-k budget: fewer blob decodes, candidates stay a superset of
        # the exact match set (the verify recovers exactness)
        full = set(srv.grep(NEEDLE))
        budgeted = {
            int(r["doc_id"])
            for r in srv.candidates_df(NEEDLE, max_query_grams=2).collect()
        }
        unbudgeted = {
            int(r["doc_id"]) for r in srv.candidates_df(NEEDLE).collect()
        }
        assert budgeted >= unbudgeted >= full
    finally:
        srv.close()


def test_grep_batch_matches_per_needle(spark, docs):
    """Warm batch grep: one shared-decode kernel job for N needles, each
    needle row-identical to grep(); per-needle limit is deterministic."""
    from bliss_rs_spark.operators.trigram import build_trigram_index

    srv = TrigramServer(
        spark, build_trigram_index(docs, lowercase=True), docs,
        n_doc_shards=4, index_lowercased=True,
    )
    try:
        needles = [(1, NEEDLE), (2, "value table"), (3, "zzz never here")]
        got = srv.grep_batch(needles)
        want = sorted(
            (nid, d) for nid, n in needles for d in srv.grep(n)
        )
        assert got == want and got, "vacuous batch"
        # per-needle limit = first-k of the deterministic per-needle order
        lim = srv.grep_batch(needles, limit=3)
        want_lim = sorted(
            (nid, d) for nid, n in needles for d in srv.grep(n, limit=3)
        )
        assert lim == want_lim
        with pytest.raises(ValueError, match="full scan"):
            srv.grep_batch([(1, "ab")])
    finally:
        srv.close()


def test_grep_batch_through_churned_store(spark, docs, tmp_path):
    """Batch grep through a warm REFRESHED from_store server: dead sets
    mask every needle's candidates."""
    store = IndexStore(str(tmp_path / "idx"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    srv = TrigramServer.from_store(spark, store, docs)
    try:
        kept = docs.filter(F.col("doc_id") % 3 != 0)
        update_index(
            spark, kept, store, CFG, delete_missing=True, repack="segment"
        )
        srv.refresh(store)
        needles = [(1, NEEDLE), (2, "value table")]
        got = srv.grep_batch(needles)
        want = sorted(
            (nid, r["doc_id"])
            for nid, n in needles
            for r in kept.collect()
            if n in r["content"]
        )
        assert got == want and got, "vacuous"
        assert all(d % 3 != 0 for _, d in got)
    finally:
        srv.close()


def test_candidate_broadcast_size_gate(spark, docs):
    """Round-6 verdict #4: the verify join's broadcast hint must be GATED
    on the pre-decode candidate bound (min over the needle's grams of the
    packed ``n`` totals).  A needle under the threshold keeps the hinted
    broadcast plan (shuffle-free warm verify); above it (forced here with
    threshold 0) the hint must be ABSENT — no driver-side materialization
    of an unbounded candidate set — and results stay identical."""
    from bliss_rs_spark.operators.trigram import build_trigram_index

    idx = build_trigram_index(docs, lowercase=True)

    def hint_in_logical(df):
        # the forced hint lives in the analyzed/optimized LOGICAL plan as
        # ResolvedHint; the physical plan may legitimately still pick a
        # broadcast from REAL runtime sizes, which is the desired behavior
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    srv = TrigramServer(spark, idx, docs, index_lowercased=True)
    srv_no = TrigramServer(
        spark, idx, docs, index_lowercased=True, broadcast_max_candidates=0
    )
    try:
        # the stats the gate consults exist and bound the true count
        bound = srv._candidate_bound(["ret", "etu"])
        assert bound > 0
        assert hint_in_logical(srv.matches(NEEDLE))
        # gated off: no forced broadcast hint in the plan (the planner/AQE
        # may still choose a broadcast from REAL sizes — that is the point)
        assert not hint_in_logical(srv_no.matches(NEEDLE))
        assert srv.grep(NEEDLE) == srv_no.grep(NEEDLE)
        # batch path takes the same gate
        b1 = srv.grep_batch([(1, NEEDLE), (2, "value table")])
        b2 = srv_no.grep_batch([(1, NEEDLE), (2, "value table")])
        assert b1 == b2
    finally:
        srv.close()
        srv_no.close()


def test_short_needle_full_scan_respects_dead_sets(spark, docs, tmp_path):
    """Round-6 ADVICE: the <3-char needle (and literal-free regex) full-scan
    fallback must drop the store's tombstoned docs like the trigram-pruned
    path does — after churn, a short needle must not resurrect deleted
    docs."""
    store = IndexStore(str(tmp_path / "short_idx"))
    build_full(spark, docs, store, CFG, checkpoint=False)
    srv = TrigramServer.from_store(spark, store, docs)
    try:
        kept = docs.filter(F.col("doc_id") % 5 != 0)
        update_index(spark, kept, store, None, delete_missing=True,
                     repack="segment")
        srv.refresh(store)
        live_ids = {int(r["doc_id"]) for r in kept.select("doc_id").collect()}
        short = "re"  # no trigrams -> full-scan fallback
        want = {
            int(r["doc_id"])
            for r in docs.collect()
            if short in r["content"] and int(r["doc_id"]) in live_ids
        }
        assert set(srv.grep(short)) == want
        # literal-free regex takes the same fallback
        want_re = {
            int(r["doc_id"])
            for r in docs.collect()
            if __import__("re").search("va..e", r["content"])
            and int(r["doc_id"]) in live_ids
        }
        assert set(srv.grep_regex("va..e")) == want_re
    finally:
        srv.close()
