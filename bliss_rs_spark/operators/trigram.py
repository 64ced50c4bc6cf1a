"""Trigram index: exact substring + regex search over source code.

BM25 answers "which docs are *about* these terms"; a code-search engine
must also answer "which docs *contain this exact byte string*" — grep at
corpus scale.  The standard design (Google Code Search, Zoekt) is a
positional-free trigram presence index: every distinct 3-char window of a
document becomes a posting, a substring query ANDs the posting lists of
its own trigrams to get a candidate set, and an exact `contains` verify
over only the candidates removes trigram false positives (trigram presence
is necessary, not sufficient — the grams may appear in different places).

Reference parity: this is the same shape as the reference's
analysis-feature cache — a derived presence table consulted before the
expensive per-file step so only un-ruled-out files are touched
(/root/reference/src/library.rs:1019-1084 re-analyzes only changed files).
Our expensive step is the full-content `contains` scan; the trigram AND
prunes it to a candidate sliver.

Scale notes (the 100 TB story):

- The index build is one narrow projection (`transform` + `array_distinct`
  + `explode`, all whole-stage codegen — no Python) feeding a distinct-free
  output: `array_distinct` dedups per document map-side, and presence
  postings need no cross-document dedup at all.  No shuffle is required to
  BUILD the flat posting set; only a sink-side repartition by gram_bucket
  for locality.
- Query-time candidate generation filters postings by a LITERAL gram list
  (predicate-pushdown into the parquet/Iceberg scan via the bucket column),
  then one partial+final count per doc_id.  The verify step is a
  broadcast-semi-join of the (small) candidate set against the documents
  table followed by `contains` — the full corpus is never content-scanned.
- Gram alphabet on code is dense ASCII (~95^3 worst case) so per-gram df
  is high but the gram DICTIONARY is tiny; hot grams (e.g. "   ") hurt the
  AND the same way hot terms hurt WAND, so candidates are counted with a
  partial+final agg (map-side combine absorbs hot grams) and the rarest
  grams alone are enough for pruning — `max_query_grams` keeps the posting
  volume read per query bounded by the rarest-k grams instead of all of
  them (presence of EVERY gram is still guaranteed by the verify step).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "build_trigram_index",
    "trigrams_of",
    "substring_candidates",
    "substring_search",
    "regex_required_literals",
    "regex_search",
    "pack_trigrams",
    "TrigramServer",
]

N_GRAM_BUCKETS = 64


def trigrams_of(s: str) -> list[str]:
    """Distinct 3-char windows of ``s``, driver-side (for query strings)."""
    return sorted({s[i : i + 3] for i in range(len(s) - 2)})


def build_trigram_index(
    docs: DataFrame, content_col: str = "content", lowercase: bool = False
) -> DataFrame:
    """documents -> (gram, gram_bucket, doc_id) presence postings.

    Pure JVM: ``transform(sequence(...))`` materializes the per-row window
    array, ``array_distinct`` dedups it map-side (presence semantics), and
    ``explode`` flattens.  Memory per row is ~3x content size transiently;
    at 100 TB that is governed by spark.sql.files.maxPartitionBytes exactly
    like every other content-width stage (tokenize has the same profile).

    ``lowercase`` folds grams (Zoekt's layout): ONE index then serves both
    case-sensitive (candidates stay a superset — a raw occurrence implies
    its folded grams — verify is exact either way) and case-insensitive
    queries (pass case_insensitive=True + index_lowercased=True to
    substring_search).
    """
    src = f"lower({content_col})" if lowercase else content_col
    # NB: Spark's sequence(1, 0) counts DOWN; the length guard keeps
    # sub-trigram docs from emitting bogus windows.
    grams = F.expr(
        f"CASE WHEN length({content_col}) >= 3 THEN"
        f" array_distinct(transform(sequence(1, length({content_col}) - 2),"
        f" i -> substring({src}, i, 3)))"
        f" ELSE array() END"
    )
    return docs.select(
        "doc_id", F.explode(grams).alias("gram")
    ).select(
        "gram",
        F.pmod(F.xxhash64(F.col("gram")), F.lit(N_GRAM_BUCKETS)).cast("int").alias("gram_bucket"),
        "doc_id",
    )


def substring_candidates(
    trigram_index: DataFrame, needle: str, max_query_grams: int | None = None
) -> DataFrame:
    """doc_ids whose trigram set covers every (kept) trigram of ``needle``.

    Superset of the true answer; `substring_search` verifies.  With
    ``max_query_grams`` set, only the k rarest grams are ANDed (rarity is
    decided distributed — one tiny df agg over the query's own grams, never
    a vocabulary collect) which bounds posting volume per query.
    """
    grams = trigrams_of(needle)
    if not grams:
        raise ValueError("needle shorter than 3 chars has no trigrams; use a full scan")
    # gram_bucket IN (...) prunes whole partition directories of a STORED
    # index (the store partitions segments by gram_bucket); gram IN (...)
    # is the row-group filter within them — same two-level pruning as the
    # term postings path (operators/bm25.py).
    spark = trigram_index.sparkSession
    buckets = sorted(
        {
            r["b"]
            for r in spark.createDataFrame([(g,) for g in grams], "gram string")
            .select(
                F.pmod(F.xxhash64("gram"), F.lit(N_GRAM_BUCKETS))
                .cast("int")
                .alias("b")
            )
            .collect()
        }
    )
    hits = trigram_index.filter(
        F.col("gram_bucket").isin(buckets) & F.col("gram").isin(grams)
    )
    if max_query_grams is not None and max_query_grams < len(grams):
        rare = (
            hits.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .orderBy("df", "gram")
            .limit(max_query_grams)
        )
        hits = hits.join(F.broadcast(rare.select("gram")), "gram")
        need = max_query_grams
    else:
        need = len(grams)
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_grams"))
        .filter(F.col("n_grams") == F.lit(need))
        .select("doc_id")
    )


def substring_search(
    docs: DataFrame,
    trigram_index: DataFrame,
    needle: str,
    content_col: str = "content",
    max_query_grams: int | None = None,
    case_insensitive: bool = False,
    index_lowercased: bool = False,
) -> DataFrame:
    """Substring match: trigram-AND candidates, then verify.

    Returns (doc_id) of documents whose content contains ``needle`` —
    byte-for-byte by default, case-folded with ``case_insensitive=True``
    (grep -i; requires an index built with lowercase=True, because a
    raw-gram index cannot produce candidates for case-divergent matches).
    ``index_lowercased`` declares the index layout: with it, even
    case-SENSITIVE queries fold the needle for candidate generation (still
    a superset — raw presence implies folded grams) and verify raw.
    Needles under 3 chars fall back to the full scan the trigram index
    cannot prune (documented grep behavior, not an error)."""
    if case_insensitive and not index_lowercased:
        raise ValueError(
            "case-insensitive search needs a lowercase-built trigram index "
            "(build_trigram_index(..., lowercase=True))"
        )
    if case_insensitive:
        verify = F.lower(F.col(content_col)).contains(F.lit(needle.lower()))
    else:
        verify = F.col(content_col).contains(F.lit(needle))
    probe = needle.lower() if index_lowercased else needle
    if len(needle) < 3:
        return docs.filter(verify).select("doc_id")
    cand = substring_candidates(trigram_index, probe, max_query_grams)
    return (
        docs.join(F.broadcast(cand), "doc_id", "left_semi")
        .filter(verify)
        .select("doc_id")
    )


# --- regex: Cox-style required-literal derivation ---------------------------

_QUANT = "*?{"  # a quantifier after an atom makes that atom optional/repeating


def _skip_quant(pattern: str, i: int) -> int:
    """i points at a quantifier char; return the index past it (incl. the
    {m,n} body and a lazy/possessive suffix)."""
    if pattern[i] == "{":
        while i < len(pattern) and pattern[i] != "}":
            i += 1
        i += 1
    else:
        i += 1
    if i < len(pattern) and pattern[i] in "?+":
        i += 1  # lazy *? / possessive *+ suffix
    return i


def regex_required_literals(pattern: str) -> list[str]:
    """Literal strings that EVERY match of ``pattern`` must contain.

    Conservative subset of the trigram-query derivation from Cox's
    "Regular Expression Matching with a Trigram Index" (public write-up of
    Google Code Search): walk the top-level concatenation, collecting runs
    of plain literal characters; any group, class, alternation, anchor, or
    quantified atom breaks the run — and breaks it on BOTH sides (`ab?c`
    requires only "a" and "c"; `ab+c` requires "ab" and "c", because the
    repeat separates the guaranteed atom from what follows).  Returns []
    when the pattern guarantees no literal, or on anything this walker
    does not fully understand (full-scan fallback) — it only ever
    UNDER-claims, so pruning with the result is always sound.
    """
    # inline flags ((?i), (?im:...), ...) change how OTHER literals match —
    # a case-insensitive pattern's extracted literals would prune away
    # legitimate matches.  Bail on any "(?" construct that is not a plain
    # non-capturing group / lookaround / named group.
    if re.search(r"\(\?[^:=!P<]", pattern):
        return []
    literals: list[str] = []
    run: list[str] = []
    stack: list[str] = []  # open group '(' / char-class '['
    i = 0
    n = len(pattern)

    def flush() -> None:
        if run:
            literals.append("".join(run))
            run.clear()

    while i < n:
        c = pattern[i]
        if stack:
            # inside a group or class: contributes nothing, parsed only to
            # find its end.  Char classes nest nothing; ']' closes them and
            # every other char (incl. '(' ')') is a member.
            if c == "\\":
                i += 2
                continue
            if stack[-1] == "[":
                if c == "]":
                    stack.pop()
                i += 1
            else:
                if c == "[":
                    stack.append("[")
                elif c == "(":
                    stack.append("(")
                elif c == ")":
                    stack.pop()
                i += 1
            if not stack and i < n and pattern[i] in _QUANT:
                i = _skip_quant(pattern, i)
            continue
        if c == "\\":
            nxt = pattern[i + 1] if i + 1 < n else ""
            if nxt and nxt not in "dDwWsSbBAZzQE0123456789":
                # escaped literal metachar (\. \* ...) is a plain char
                if i + 2 < n and pattern[i + 2] in _QUANT:
                    flush()
                    i = _skip_quant(pattern, i + 2)
                else:
                    run.append(nxt)
                    i += 2
            else:
                flush()  # class shorthand / boundary: run breaks
                i += 2
            continue
        if c in "([":
            flush()
            stack.append(c)
            i += 1
            continue
        if c in ")]":
            return []  # unbalanced / class-member quirk: bail conservatively
        if c == "|":
            # top-level alternation: NOTHING outside this walk is guaranteed
            return []
        if c in "^$.":
            flush()
            i += 1
            continue
        if c == "+":
            # x+ guarantees one x adjacent to its LEFT context; the repeat
            # separates it from the right, so flush AFTER keeping the run.
            flush()
            i += 1
            if i < n and pattern[i] in "?+":
                i += 1
            continue
        if c in _QUANT:
            # x? / x* / x{..}: the preceding char is not guaranteed
            if run:
                run.pop()
            flush()
            i = _skip_quant(pattern, i)
            continue
        run.append(c)
        i += 1
    if stack:
        return []  # unterminated group/class: bail
    flush()
    return [lit for lit in literals if lit]


def regex_search(
    docs: DataFrame,
    trigram_index: DataFrame,
    pattern: str,
    content_col: str = "content",
    max_query_grams: int | None = None,
    index_lowercased: bool = False,
) -> DataFrame:
    """Regex match over content, trigram-pruned when the pattern allows.

    The final `rlike` verify is always exact; the trigram AND on the
    longest required literal (when one >= 3 chars exists) just shrinks the
    verified set.  Patterns with no usable literal degrade to the full
    scan — same contract as grep over an unindexed tree.  Over a folded
    index (``index_lowercased``) the anchor literal probes lowercased —
    still a superset, since a raw occurrence implies its folded grams.
    """
    verify = F.col(content_col).rlike(pattern)
    lits = [lit for lit in regex_required_literals(pattern) if len(lit) >= 3]
    if not lits:
        return docs.filter(verify).select("doc_id")
    anchor = max(lits, key=len)
    if index_lowercased:
        anchor = anchor.lower()
    cand = substring_candidates(trigram_index, anchor, max_query_grams)
    return (
        docs.join(F.broadcast(cand), "doc_id", "left_semi")
        .filter(verify)
        .select("doc_id")
    )


# --- warm serving: packed gram blobs + kernel intersection (Zoekt shape) -----

def pack_trigrams(
    trigram_index: DataFrame, n_doc_shards: int = 32
) -> DataFrame:
    """(gram, gram_bucket, shard, n, docs_blob): each (gram, doc-shard)'s
    sorted doc list as one delta+varbyte blob (functions/codec.py — the
    same encoding as the WAND doc maps).

    Doc-sharding caps any single blob at ~|corpus|/n_doc_shards docs (hot
    grams like '   ' appear in most files), and gives the server the same
    structural property the WAND packs use: every gram of one shard lands
    in one partition, so a query's AND-intersection runs shard-local with
    no per-query shuffle.  ``n`` (list length) lets the kernel intersect
    rarest-first without decoding.

    Construction is the sort-shuffle streaming packer (operators/pack.py's
    build_packed_index shape): ONE shuffle (repartition by shard) +
    sortWithinPartitions(shard, gram, doc_id) + a mapInPandas pass that
    slices each sorted Arrow batch at (shard, gram) boundaries, carrying the
    tail group across batches.  Python cost is one invocation per Arrow
    batch, not per (gram, shard) group — a trigram vocabulary is small
    (~26k printable grams) but x n_doc_shards it still meant up to ~1M tiny
    applyInPandas groups; the streaming pass cut server init ~5x.  Hot grams
    ('   ', 'the') are absorbed by the sorter, not a groupBy key."""
    shard_col = F.pmod(F.xxhash64("doc_id"), F.lit(int(n_doc_shards))).cast("int")
    arranged = (
        trigram_index.withColumn("shard", shard_col)
        .select("shard", "gram", "gram_bucket", "doc_id")
        .repartition(int(n_doc_shards), "shard")
        .sortWithinPartitions("shard", "gram", "doc_id")
    )
    schema = "gram string, gram_bucket int, shard int, n long, docs_blob binary"

    def pack_stream(batches):
        from bliss_rs_spark.functions.codec import encode_doc_ids

        pend = None  # (shard, gram, bucket, docs) tail group awaiting more rows

        def emit(shard, gram, bucket, docs, out):
            docs = np.unique(docs)  # store re-adds may duplicate (gram, doc)
            out["gram"].append(gram)
            out["gram_bucket"].append(int(bucket))
            out["shard"].append(int(shard))
            out["n"].append(int(len(docs)))
            out["docs_blob"].append(encode_doc_ids(docs))

        for pdf in batches:
            if len(pdf) == 0:
                continue
            shards = pdf["shard"].to_numpy(np.int32)
            grams = pdf["gram"].to_numpy(object)
            buckets = pdf["gram_bucket"].to_numpy(np.int32)
            docs = pdf["doc_id"].to_numpy(np.int64)
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = (shards[1:] != shards[:-1]) | (grams[1:] != grams[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))

            out = {"gram": [], "gram_bucket": [], "shard": [], "n": [], "docs_blob": []}
            for gi, (s, e) in enumerate(zip(starts, ends)):
                g = (int(shards[s]), grams[s], int(buckets[s]), docs[s:e])
                if gi == 0 and pend is not None:
                    if pend[0] == g[0] and pend[1] == g[1]:
                        g = (g[0], g[1], g[2], np.concatenate([pend[3], g[3]]))
                    else:
                        emit(*pend, out)
                    pend = None
                if gi == len(starts) - 1:
                    pend = g  # may continue in the next batch
                else:
                    emit(*g, out)
            if out["gram"]:
                yield pd.DataFrame(out)
        if pend is not None:
            out = {"gram": [], "gram_bucket": [], "shard": [], "n": [], "docs_blob": []}
            emit(*pend, out)
            yield pd.DataFrame(out)

    return arranged.mapInPandas(pack_stream, schema)


class TrigramServer:
    """Warm substring/regex candidate serving: the packed gram blobs live
    in cached executor partitions (repartitioned by shard once at init, the
    WandServer structural-placement argument), and a query is ONE
    shuffle-free job — filter the cached frame to the needle's grams, each
    shard task decodes its blobs rarest-first and np.intersect1d's them,
    and the matching doc_ids come back for the (exact, match-sized) verify
    against the documents frame.

    ``index_lowercased`` mirrors substring_search: a folded index serves
    case-sensitive queries exactly (superset candidates + raw verify) and
    grep -i.  Construct over store.load(spark, 'trigram') for a live store
    (tombstones already applied by load; re-point by rebuilding — blobs are
    derived, snapshot-scoped state like the WAND packs).
    """

    def __init__(
        self,
        spark: SparkSession,
        trigram_index: DataFrame,
        docs: DataFrame,
        n_doc_shards: int = 32,
        index_lowercased: bool = False,
        target_partitions: int | None = None,
        content_col: str = "content",
    ):
        self.spark = spark
        self.index_lowercased = index_lowercased
        self._content_col = content_col
        if target_partitions is None:
            target_partitions = spark.sparkContext.defaultParallelism
        self._packed = (
            pack_trigrams(trigram_index, n_doc_shards)
            .repartition(max(int(target_partitions), 1), "shard")
            .persist()
        )
        self._packed.count()  # materialize the cache
        self._docs = docs.persist()
        self._docs.count()

    def candidates(self, needle: str) -> list[int]:
        """Sorted doc_ids whose gram set covers the needle's grams — the
        trigram AND, served warm.  Superset of the true match set."""
        probe = needle.lower() if self.index_lowercased else needle
        grams = trigrams_of(probe)
        if not grams:
            raise ValueError("needle shorter than 3 chars: use a full scan")
        need = len(grams)

        def kernel(batches):
            by_shard: dict[int, list] = {}
            for pdf in batches:
                for shard, n, blob in zip(pdf["shard"], pdf["n"], pdf["docs_blob"]):
                    by_shard.setdefault(int(shard), []).append((int(n), blob))
            from bliss_rs_spark.functions.codec import decode_doc_ids

            out: list[np.ndarray] = []
            for rows in by_shard.values():
                if len(rows) < need:
                    continue  # some gram absent from this shard entirely
                rows.sort(key=lambda r: r[0])  # rarest-first
                cur: np.ndarray | None = None
                for _, blob in rows:
                    d = decode_doc_ids(bytes(blob))
                    cur = d if cur is None else np.intersect1d(
                        cur, d, assume_unique=True
                    )
                    if not len(cur):
                        break
                if cur is not None and len(cur):
                    out.append(cur)
            yield pd.DataFrame(
                {"doc_id": np.concatenate(out) if out else
                 np.empty(0, dtype=np.int64)}
            )

        rows = (
            self._packed.filter(F.col("gram").isin(grams))
            .mapInPandas(kernel, "doc_id long")
            .collect()
        )
        return sorted(int(r["doc_id"]) for r in rows)

    def grep(
        self, needle: str, case_insensitive: bool = False, limit: int | None = None
    ) -> list[int]:
        """Exact substring match, warm: kernel candidates + a match-sized
        verify over the cached documents frame."""
        if case_insensitive and not self.index_lowercased:
            raise ValueError("case-insensitive grep needs a lowercase index")
        c = F.col(self._content_col)
        if case_insensitive:
            verify = F.lower(c).contains(F.lit(needle.lower()))
        else:
            verify = c.contains(F.lit(needle))
        if len(needle) < 3:
            out = self._docs.filter(verify).select("doc_id")
        else:
            cand = self.candidates(needle)
            if not cand:
                return []
            out = self._docs.filter(
                F.col("doc_id").isin(cand) & verify
            ).select("doc_id")
        if limit is not None:
            out = out.limit(limit)
        return sorted(int(r["doc_id"]) for r in out.collect())

    def close(self):
        self._packed.unpersist()
        self._docs.unpersist()
