"""Capture .explain("formatted") for registry queries + key internal frames.

Usage: python tools/capture_plans.py <out_dir> <suffix> [name ...]
Writes <out_dir>/<name>_<suffix>.txt for each requested registry entry, plus
internal frames (pack:packed, pack:doc_map, lifecycle pieces) under
descriptive names.  Run at sf0.01 — plan SHAPE is sf-independent.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from bliss_rs_spark.session import get_spark

    spark = get_spark("plan_capture")

    # internal frames, by pseudo-name
    def internal(name: str):
        from bliss_rs_spark.config import IndexConfig
        from bliss_rs_spark.corpus import documents_from_testdata
        from bliss_rs_spark.operators.build_index import build_index_frames
        from bliss_rs_spark.operators.pack import build_packed_index_full

        cfg = IndexConfig()
        docs = documents_from_testdata(spark, sf_dir)
        if name == "internal_pack_doc_map":
            idx = build_index_frames(docs, cfg)
            packed, doc_map = build_packed_index_full(
                idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg
            )
            return doc_map
        if name == "internal_pack_packed":
            idx = build_index_frames(docs, cfg)
            packed, doc_map = build_packed_index_full(
                idx.postings, idx.term_stats, idx.n_docs, idx.avgdl, cfg
            )
            return packed
        if name == "internal_simhash":
            from bliss_rs_spark.operators.dedup import simhash64

            return simhash64(docs)
        if name == "internal_minhash_lsh":
            from bliss_rs_spark.operators.dedup import minhash_lsh_pairs

            return minhash_lsh_pairs(
                docs, n_hashes=8, bands=4, jaccard_threshold=0.05
            )
        if name == "internal_trigram_substring":
            from bliss_rs_spark.operators.trigram import (
                build_trigram_index,
                substring_search,
            )

            return substring_search(docs, build_trigram_index(docs), "fast merge")
        raise KeyError(name)

    from bliss_rs_spark.plans.driver_queries import registry

    reg = registry()
    for name in names:
        try:
            if name.startswith("internal_"):
                df = internal(name)
            else:
                df = reg[name][0](spark, sf_dir)
            txt = explain_str(df)
        except Exception as e:  # noqa: BLE001
            txt = f"CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
