"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship end-to-end run on sf0.001 — build the inverted
  index over the documents table and answer the reference-style query set
  with batched exhaustive BM25.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2, backed by bliss_rs_spark.plans.driver_queries.  EVERY Spark
  callable has an exactly-mirrored DuckDB SQL string — seeded-NumPy constants
  (LSH planes, IVF codebook, model weights) are emitted into the SQL as
  literal double arrays and replayed with identical sequential float64
  arithmetic.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the FULL pipeline — tokenize ->
    postings/stats -> ordinal-compressed doc-sharded packed index ->
    block-max WAND batched top-k over the reference-style query set."""
    from bliss_rs_spark.config import IndexConfig
    from bliss_rs_spark.corpus import documents_from_testdata
    from bliss_rs_spark.operators.build_index import build_index_frames
    from bliss_rs_spark.operators.pack import build_packed_index_full
    from bliss_rs_spark.operators.wand import wand_topk_batch
    from bliss_rs_spark.session import ship_package

    ship_package(spark)
    cfg = IndexConfig()
    docs = documents_from_testdata(spark, "/root/testdata/sf0.001")
    idx = build_index_frames(docs, cfg)
    packed, doc_map = build_packed_index_full(
        idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg
    )
    query_set = [
        (1, "spark hash join", 10),
        (2, "window merge sort", 10),
        (3, "fastScanBatch", 10),   # camelCase: matches only via sub-token split
        (4, "the a big small", 10),
        (5, "stream filter", 100),
    ]
    return wand_topk_batch(
        spark, packed, idx.term_stats, idx.avgdl, query_set, cfg, doc_map=doc_map
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bliss_rs_spark.plans.driver_queries import registry

    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from bliss_rs_spark.plans.driver_queries import registry

    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
