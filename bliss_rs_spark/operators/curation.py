"""Corpus curation: the quality-gate + exact-dedup composition a
training-data pipeline runs before anything else touches the corpus.

Reference parity: bliss-rs filters its library the same two-stage way —
per-song analysis signals gate what enters the store
(/root/reference/src/library.rs:1019-1022 skips already-analyzed, the error
ledger drops failures) and playlist dedup collapses exact metadata matches
(/root/reference/src/playlist.rs:367-402).  Here the signals are text
quality metrics and the collapse is the sha256 keep-one.

Everything is JVM expressions + two equi-shuffles on the sha key — no
Python in the path, filter predicates reach the scan, and the dedup
aggregation is partial+final.  At 100 TB curation is a single pass."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bliss_rs_spark.functions.text_stats import quality_exprs_spark


def with_quality_signals(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Append the curation signals (n_tokens, stopword_ratio, alnum_ratio)
    as columns — all built-in string expressions, shared with the DuckDB
    oracle via functions/text_stats.py."""
    e = quality_exprs_spark(content_col)
    return (
        docs.withColumn("n_tokens", F.expr(e["n_tokens"]).cast("long"))
        .withColumn("stopword_ratio", F.expr(e["stopword_ratio"]))
        .withColumn("alnum_ratio", F.expr(e["alnum_ratio"]))
    )


def curate_corpus(
    docs: DataFrame,
    content_col: str = "content",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.6,
    min_alnum_ratio: float = 0.4,
    langs: list[str] | None = None,
) -> DataFrame:
    """Quality-filter the corpus, then keep ONE representative (smallest
    doc_id) per content_sha256 — the standard pre-training curation pass:

      scan -> quality signals (JVM exprs, pushed filters)
           -> threshold gate (+ optional language allowlist)
           -> exact dedup (groupBy sha + semi-join keep-one)

    Returns the surviving docs with their signals attached."""
    out = with_quality_signals(docs, content_col)
    cond = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
        & (F.col("alnum_ratio") >= min_alnum_ratio)
    )
    if langs:
        cond = cond & F.col("lang").isin(list(langs))
    filtered = out.filter(cond)
    keep = filtered.groupBy("content_sha256").agg(F.min("doc_id").alias("doc_id"))
    return filtered.join(keep, ["content_sha256", "doc_id"], "left_semi")
