"""Stage-by-stage wall-clock profile of the build_full path at one
parallelism level (diagnostic tool; not part of the engine)."""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(cpus: int, n_docs: int) -> None:
    from bliss_rs_spark.config import IndexConfig
    from bliss_rs_spark.corpus import synth_documents, with_invariants
    from bliss_rs_spark.operators.build_index import (
        build_doc_stats,
        build_postings,
        build_term_stats,
        split_errors,
        tokenize_documents,
    )
    from bliss_rs_spark.operators.pack import build_packed_index
    from bliss_rs_spark.session import get_spark
    from bliss_rs_spark.sources.index_store import IndexStore

    spark = get_spark(f"prof_build_{cpus}", cpus=cpus)
    cfg = IndexConfig()
    work = tempfile.mkdtemp(prefix=f"profb_{cpus}_")
    t = {}
    try:
        corpus_dir = os.path.join(work, "corpus")
        with_invariants(
            synth_documents(spark, n_docs, seed=42, n_partitions=128)
        ).write.parquet(corpus_dir)
        docs = spark.read.parquet(corpus_dir)
        docs.count()

        store = IndexStore(os.path.join(work, "idx"))

        t0 = time.perf_counter()
        tokenized = tokenize_documents(docs, cfg).withColumn(
            "analyzer_version", F.lit(cfg.analyzer_version)
        )
        store.append_checkpoint(tokenized)
        t["tokenize+ckpt_write"] = time.perf_counter() - t0

        ckpt = store.load_checkpoint(spark)
        ok, errors = split_errors(ckpt)

        t0 = time.perf_counter()
        doc_stats = build_doc_stats(ok)
        doc_stats.agg(F.count(F.lit(1)), F.avg("dl")).collect()
        t["doc_stats_agg"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        postings = build_postings(ok, cfg)
        term_stats = build_term_stats(postings, n_docs).cache()
        term_stats.agg(F.sum("df")).collect()
        t["term_stats"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        packed = build_packed_index(postings, term_stats, n_docs, 50.0, cfg)
        packed.write.mode("overwrite").parquet(os.path.join(work, "packed"))
        t["packed_build+write"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        postings.sortWithinPartitions("term", "doc_id").write.mode("overwrite").partitionBy(
            "term_bucket"
        ).parquet(os.path.join(work, "postings"))
        t["postings_write"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        doc_stats.write.mode("overwrite").parquet(os.path.join(work, "doc_stats"))
        t["doc_stats_write"] = time.perf_counter() - t0

        print(json.dumps({"cpus": cpus, **{k: round(v, 2) for k, v in t.items()}}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 200000)
