"""Pluggable top-k scorer (F6): rank ANY DataFrame by a user-supplied scoring
expression — the Spark-native analogue of the reference's custom-sorted
playlist hook ``playlist_from_custom(..., sort_by: impl FnMut)``
(/root/reference/src/library.rs:805-842).

The scorer is a ``Column`` (or a callable ``DataFrame -> Column``) instead of
a row closure: it stays a Catalyst expression, so scoring runs JVM-side in
whole-stage codegen and ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject (per-partition top-k + driver merge — no global sort,
no shuffle of the full table).  Python row functions would put the hot loop
back in the interpreter; users who genuinely need Python supply a pandas-UDF
column, which slots in unchanged.

BM25 (operators/bm25.py:bm25_score_col) and the cosine scorer below are the
two built-in instances; the engine's own entry points are compositions of
this contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Scorer = Column | Callable[[DataFrame], Column]


def topk(
    df: DataFrame,
    scorer: Scorer,
    k: int,
    id_col: str = "doc_id",
    descending: bool = True,
    score_col: str = "score",
) -> DataFrame:
    """Exact top-k of ``df`` under ``scorer`` with deterministic tie-breaks
    (score, then ascending ``id_col`` — the engine-wide ordering contract).

    scorer: a Column expression over df's columns, or a callable df -> Column
    (for scorers that need the DataFrame, e.g. to resolve qualified columns).
    """
    score = scorer(df) if callable(scorer) else scorer
    scored = df.withColumn(score_col, score)
    order = F.desc(score_col) if descending else F.asc(score_col)
    return scored.orderBy(order, F.asc(id_col)).limit(k)


def cosine_scorer(query_vec: list[float], vec_col: str = "embedding") -> Column:
    """Cosine similarity against a literal query vector as a pure Column —
    the similarity-search scorer as a topk() instance."""
    from bliss_rs_spark.operators.similarity import _dot, _norm

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
