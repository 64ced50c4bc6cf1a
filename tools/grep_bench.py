"""Grep-tier + filtered-serving measurement at a larger corpus (round 5).

Synthesizes N docs (GREP_BENCH_N, default 200k), builds the trigram index
into the store's partitioned layout, and measures:
  - trigram index build+write (the one-time cost)
  - substring search cold/warm per needle class (rare literal, hot-ish
    keyword, multi-token span, miss)
  - the unindexable baseline: a full content scan for the same needle
  - filtered vs unfiltered warm WandServer p50 with a 20%-selectivity
    registered filter

Prints one JSON line; results are recorded in BENCH/BASELINE.md §12.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.corpus import synth_documents, with_invariants
from bliss_rs_spark.operators.build_index import build_index_frames
from bliss_rs_spark.operators.pack import build_packed_index_full
from bliss_rs_spark.operators.trigram import build_trigram_index, substring_search
from bliss_rs_spark.operators.wand import WandServer
from bliss_rs_spark.session import get_spark


def main() -> None:
    n = int(os.environ.get("GREP_BENCH_N", "200000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.environ.get("GREP_BENCH_DIR", "/tmp/grep_bench")
    spark = get_spark("grep_bench", cpus=cpus)
    cfg = IndexConfig()

    docs = with_invariants(synth_documents(spark, n, seed=5)).cache()
    docs.count()

    res: dict = {"n_docs": n, "cpus": cpus}

    t0 = time.perf_counter()
    tri = build_trigram_index(docs)
    path = os.path.join(out_dir, "trigram.parquet")
    tri.write.mode("overwrite").partitionBy("gram_bucket").parquet(path)
    res["trigram_build_write_sec"] = round(time.perf_counter() - t0, 2)
    stored = spark.read.parquet(path)
    res["trigram_rows"] = stored.count()

    needles = {
        "rare": "posting_block_codec bucket",
        "keyword": "return posting",
        "span": "blockMaxScore bm25_partial_score score",
        "miss": "zzz never appears here",
    }
    # the scale argument is IO, not in-memory CPU: a 100 TB corpus cannot be
    # content-scanned per query; record the bytes-touched proxy explicitly
    res["content_bytes_total"] = int(
        docs.agg(F.sum(F.length("content"))).collect()[0][0]
    )

    from bliss_rs_spark.operators.trigram import trigrams_of

    res["substring"] = {}
    for name, needle in needles.items():
        grams = trigrams_of(needle)
        times, btimes = [], []
        hits = None
        for _ in range(3):
            t0 = time.perf_counter()
            hits = substring_search(docs, stored, needle).count()
            times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            bhits = substring_search(
                docs, stored, needle, max_query_grams=6
            ).count()
            btimes.append(time.perf_counter() - t0)
            assert bhits == hits, (name, bhits, hits)
        # posting rows a query touches (the IO the index pays INSTEAD of
        # scanning every content byte)
        rows_read = (
            stored.filter(F.col("gram").isin(grams)).count() if grams else 0
        )
        res["substring"][name] = {
            "cold_sec": round(times[0], 3),
            "warm_sec": round(min(times[1:]), 3),
            "warm_budget6_sec": round(min(btimes[1:]), 3),
            "hits": hits,
            "n_grams": len(grams),
            "gram_posting_rows_read": rows_read,
        }
        # unindexed baseline: full content scan for the same needle (an
        # in-memory-cached corpus at this SF — see BENCH §12 framing)
        t0 = time.perf_counter()
        full = docs.filter(F.col("content").contains(needle)).count()
        res["substring"][name]["full_scan_sec"] = round(
            time.perf_counter() - t0, 3
        )
        assert full == hits, (name, full, hits)

    # filtered vs unfiltered warm serving
    idx = build_index_frames(docs, cfg)
    packed, doc_map = build_packed_index_full(
        idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg
    )
    srv = WandServer(spark, packed, idx.term_stats, idx.avgdl, cfg, doc_map)
    srv.set_filter("fifth", docs.filter(F.col("doc_id") % 5 == 0).select("doc_id"))
    qs = ["return value data", "blockMaxScore", "merge sorted runs",
          "posting block codec", "shard cursor"]
    for mode, kw in (("unfiltered", {}), ("filtered", {"filter_name": "fifth"})):
        srv.query(qs[0], 10, **kw)  # warm-up
        lat = sorted(
            _t(lambda q=q: srv.query(q, 10, **kw)) for q in qs
        )
        res[f"{mode}_serve_p50_sec"] = round(lat[len(lat) // 2], 3)
    srv.close()

    print(json.dumps(res))


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
