"""Positional postings + exact phrase queries.

The flat/packed indexes store (term, tf) — enough for BM25.  Phrase queries
("exact token sequence") need positions; this module builds the positional
postings table and answers phrase queries by chained position intersection:

    occurrences(t1..tn, d) = |P1 ∩ (P2 - 1) ∩ ... ∩ (Pn - (n-1))|

where Pi is term ti's position set in d.  Everything is built-in JVM:
positions come from ``posexplode`` of the SQL tokenizer mirror (identical to
the pandas-UDF spec — tested), the intersection chain is array arithmetic.

Reference parity: positions are the ordinal the reference keeps implicitly
via ``feature_index`` (UNIQUE(song_id, feature_index),
/root/reference/src/library.rs:521-528) — order-preserving explode with
``posexplode`` is the same move (SURVEY.md §2.8 array row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.functions.tokenizer import tokenize_sql_spark, tokenize_text


def build_positional_postings(docs: DataFrame, cfg: IndexConfig | None = None) -> DataFrame:
    """(term, term_bucket, doc_id, positions array<int>, tf).

    posexplode(token_array) -> groupBy(term, doc) collect sorted positions.
    The token array comes from the JVM mirror of TOKENIZER SPEC v1, so
    positional and bag-of-words indexes agree on every term (tested).
    """
    cfg = cfg or IndexConfig()
    toks = docs.select(
        "doc_id", F.posexplode(F.expr(tokenize_sql_spark("content"))).alias("pos", "term")
    )
    return (
        toks.groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .select(
            "term",
            F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int").alias("term_bucket"),
            "doc_id",
            "positions",
            F.size("positions").alias("tf"),
        )
    )


def phrase_match(
    spark: SparkSession,
    positional: DataFrame,
    phrase: str,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """(doc_id, phrase_tf) for every doc containing the exact token sequence.

    n-way self-join on doc_id over the phrase's terms (each side pre-filtered
    by pushed term predicate), then one array-intersection expression; no
    content scan, no UDF.  Duplicate terms in the phrase are handled by
    offsetting the SAME posting list at two offsets.
    """
    cfg = cfg or IndexConfig()
    terms = tokenize_text(phrase)
    if not terms:
        return spark.createDataFrame([], "doc_id long, phrase_tf int")
    uniq = sorted(set(terms))
    pruned = positional.filter(F.col("term").isin(uniq))

    joined = None
    for i, t in enumerate(terms):
        side = pruned.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"p{i}")
        )
        joined = side if joined is None else joined.join(side, "doc_id")

    # chain: survivors after step i = positions p0 such that p0+j ∈ pj ∀ j<=i.
    # NB: the shift lambda must take exactly ONE argument — F.transform
    # interprets a second lambda parameter as the array index, which would
    # silently shadow a default-captured loop variable.
    def shift_by(offset: int):
        return lambda x: x - offset

    surv = F.col("p0")
    for i in range(1, len(terms)):
        surv = F.array_intersect(surv, F.transform(F.col(f"p{i}"), shift_by(i)))
    out = joined.select(
        "doc_id", F.size(surv).alias("phrase_tf")
    ).filter(F.col("phrase_tf") > 0)
    return out


def phrase_topk(
    spark: SparkSession,
    positional: DataFrame,
    phrase: str,
    k: int = 10,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """Docs ranked by exact-phrase occurrence count (tie: doc_id ASC)."""
    return (
        phrase_match(spark, positional, phrase, cfg)
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
    )
