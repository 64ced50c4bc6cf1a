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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "build_trigram_index",
    "trigrams_of",
    "substring_candidates",
    "substring_search",
    "regex_required_literals",
    "regex_search",
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
