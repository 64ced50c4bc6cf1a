"""spark-submit entrypoint: build / update / query / bench an index.

Ship mode (north star): the package zips itself (session.package_zip) and
runs as

    spark-submit --py-files $(python -c 'from bliss_rs_spark.session import package_zip; print(package_zip())') \\
        -m bliss_rs_spark build --source /data/documents --index /data/index

or locally:

    python -m bliss_rs_spark build  --source /root/testdata/sf0.01/documents.parquet.adapted --index /tmp/idx
    python -m bliss_rs_spark update --source ...                  --index /tmp/idx
    python -m bliss_rs_spark query  --index /tmp/idx --text "parseHtml buffer" --k 10 [--exhaustive]
    python -m bliss_rs_spark synth  --n 10000 --dest /tmp/corpus   (deterministic corpus)

The CLI is the examples/ analogue of the reference
(/root/reference/examples/library.rs): thin argument plumbing over the
library lifecycle.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bliss_rs_spark")
    ap.add_argument("--cpus", type=int, default=None, help="local[n] size (env SPARK_GRAFT_CPUS)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="full index build (checkpoint-resumable)")
    b.add_argument("--source", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--format", default=None, choices=[None, "parquet", "iceberg"])
    b.add_argument("--no-checkpoint", action="store_true")
    b.add_argument("--positions", action="store_true",
                   help="also store positional postings (enables phrase queries)")
    b.add_argument("--trigrams", action="store_true",
                   help="also store trigram postings (enables grep queries)")

    u = sub.add_parser("update", help="incremental update from a new corpus state")
    u.add_argument("--source", required=True)
    u.add_argument("--index", required=True)
    u.add_argument("--format", default=None, choices=[None, "parquet", "iceberg"])
    u.add_argument("--delete-missing", action="store_true")
    u.add_argument("--repack", default="merge", choices=["merge", "segment"],
                   help="packed policy: merge = repack touched shards "
                        "(read-optimized, hard-links the rest); segment = "
                        "pack only the delta as its own unit (zero rewrites)")
    u.add_argument("--df-source", default="auto",
                   choices=["auto", "checkpoint", "packed"],
                   help="segment-mode df/sum_dl decrement source: checkpoint "
                        "scan (O(delta) jobs) vs packed-unit decode; auto "
                        "verifies checkpoint coverage and falls back")
    u.add_argument("--no-maintain", action="store_true",
                   help="skip the post-commit tiered compaction ladder")

    cp = sub.add_parser("compact", help="fold all packed units into one base pack "
                                        "(segment-merge for the query structure; "
                                        "no re-tokenize, no postings rewrite)")
    cp.add_argument("--index", required=True)
    cp.add_argument("--full", action="store_true",
                    help="FULL compaction from the tokenize checkpoint: fold "
                         "segments, clear tombstones, re-pin avgdl")

    mt = sub.add_parser("maintain", help="run the tiered maintenance ladder once "
                                         "(no-op when under the config thresholds)")
    mt.add_argument("--index", required=True)

    mg = sub.add_parser("migrate", help="re-analyze the store at a newer analyzer_version")
    mg.add_argument("--index", required=True)
    mg.add_argument("--analyzer-version", type=int, required=True)
    mg.add_argument("--source", default=None,
                    help="document source (only needed if the store has no checkpoint)")
    mg.add_argument("--format", default=None, choices=[None, "parquet", "iceberg"])

    q = sub.add_parser("query", help="top-k BM25 query against the CURRENT snapshot")
    q.add_argument("--index", required=True)
    q.add_argument("--text", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--exhaustive", action="store_true", help="skip WAND pruning")
    q.add_argument("--phrase", action="store_true",
                   help="exact-phrase query (index must be built with --positions)")

    sv = sub.add_parser("serve", help="warm low-latency query loop (WandServer): "
                                      "one query per stdin line (or --queries file), "
                                      "one JSON result line per query")
    sv.add_argument("--index", required=True)
    sv.add_argument("--k", type=int, default=10)
    sv.add_argument("--queries", default=None,
                    help="file with one query per line (default: stdin)")
    sv.add_argument("--grep", action="store_true",
                    help="serve warm substring matches (TrigramServer) — "
                    "needs --source for the verify step")
    sv.add_argument("--source", default=None,
                    help="documents table (grep mode verify)")
    sv.add_argument("--format", default=None, choices=[None, "parquet", "iceberg"])
    sv.add_argument("--phrase", action="store_true",
                    help="serve exact-phrase queries (PhraseServer; index "
                         "must be built with --positions)")

    se = sub.add_parser("search", help="unified query-string search: "
                        '+must -not should "phrase" pref* term~N field:val')
    se.add_argument("--index", required=True)
    se.add_argument("--query", required=True)
    se.add_argument("--k", type=int, default=10)

    g = sub.add_parser("grep", help="exact substring / regex match via the "
                       "trigram index (build with --trigrams)")
    g.add_argument("--index", required=True)
    g.add_argument("--source", required=True,
                   help="documents table for the verify step (content of record)")
    g.add_argument("--format", default=None, choices=[None, "parquet", "iceberg"])
    mx = g.add_mutually_exclusive_group(required=True)
    mx.add_argument("--needle", default=None, help="literal substring")
    mx.add_argument("--regex", default=None, help="regex pattern")
    g.add_argument("-i", "--ignore-case", action="store_true",
                   help="case-insensitive substring match (needle mode)")
    g.add_argument("-n", "--lines", action="store_true",
                   help="print file:line:col matches (needle mode)")
    g.add_argument("--limit", type=int, default=100)

    st = sub.add_parser("stats", help="print CURRENT snapshot meta + metrics")
    st.add_argument("--index", required=True)

    s = sub.add_parser("synth", help="write a deterministic synthetic corpus")
    s.add_argument("--n", type=int, required=True)
    s.add_argument("--dest", required=True)
    s.add_argument("--seed", type=int, default=42)

    args = ap.parse_args(argv)

    from bliss_rs_spark.config import IndexConfig
    from bliss_rs_spark.session import get_spark

    spark = get_spark(f"bliss_rs_spark_{args.cmd}", cpus=args.cpus)
    cfg = IndexConfig()
    try:
        if args.cmd == "synth":
            from bliss_rs_spark.corpus import synth_documents, with_invariants

            with_invariants(
                synth_documents(spark, args.n, seed=args.seed)
            ).write.mode("overwrite").parquet(args.dest)
            print(json.dumps({"written": args.n, "dest": args.dest}))
            return 0

        from bliss_rs_spark.sources.index_store import IndexStore

        store = IndexStore(args.index)
        if args.cmd == "stats":
            import os

            with open(os.path.join(store.snapshot_dir(), "metrics.json")) as f:
                metrics = json.load(f)
            print(
                json.dumps(
                    {
                        "current": store.current_snapshot(),
                        "snapshots": store.snapshots(),
                        "meta": store.meta(),
                        "metrics": metrics,
                    }
                )
            )
            return 0
        if args.cmd in ("build", "update"):
            from bliss_rs_spark.plans.lifecycle import build_full, update_index
            from bliss_rs_spark.sources.documents import load_documents

            docs = load_documents(spark, args.source, args.format)
            if args.cmd == "build":
                if args.positions or args.trigrams:
                    from dataclasses import replace

                    cfg = replace(
                        cfg,
                        store_positions=cfg.store_positions or args.positions,
                        store_trigrams=cfg.store_trigrams or args.trigrams,
                    )
                name = build_full(
                    spark, docs, store, cfg, checkpoint=not args.no_checkpoint
                )
            else:
                # inherit the index's persisted config (positions, ordinals,
                # analyzer version) rather than the CLI default
                name = update_index(
                    spark, docs, store, None,
                    delete_missing=args.delete_missing, repack=args.repack,
                    df_source=args.df_source,
                    auto_maintain=not args.no_maintain,
                )
            import os

            with open(os.path.join(store.snapshot_dir(), "metrics.json")) as f:
                metrics = json.load(f)
            print(json.dumps({"snapshot": name, **metrics}))
            return 0

        if args.cmd == "serve":
            import time

            if args.grep:
                from bliss_rs_spark.operators.trigram import TrigramServer
                from bliss_rs_spark.sources.documents import load_documents

                if not args.source:
                    raise SystemExit("serve --grep needs --source")
                gdocs = load_documents(spark, args.source, args.format)
                if "doc_id" not in gdocs.columns:
                    from bliss_rs_spark.corpus import with_invariants

                    gdocs = with_invariants(gdocs)
                # per-segment packs from the derived cache + dead sets;
                # ":refresh" re-points at the CURRENT snapshot reusing
                # fingerprint-unchanged units (round-6)
                server = TrigramServer.from_store(spark, store, gdocs)
                print(json.dumps({"ready": True, "mode": "grep"}), flush=True)
                lines = open(args.queries) if args.queries else sys.stdin
                try:
                    for line in lines:
                        text = line.strip()
                        if not text:
                            continue
                        if text == ":refresh":
                            info = server.refresh(store)
                            print(json.dumps({"refreshed": True, **info}),
                                  flush=True)
                            continue
                        if text.startswith(":regex "):
                            pat = text[len(":regex "):]
                            t0 = time.perf_counter()
                            ids = server.grep_regex(pat, limit=args.k)
                            ms = round(1000 * (time.perf_counter() - t0), 1)
                            print(json.dumps({
                                "regex": pat, "ms": ms, "doc_ids": ids,
                            }), flush=True)
                            continue
                        ln = text.startswith("-n ")
                        if ln:
                            text = text[3:]
                        ci = text.startswith("-i ")
                        needle = text[3:] if ci else text
                        t0 = time.perf_counter()
                        if ln:
                            rows = server.grep_lines(
                                needle, case_insensitive=ci, limit=args.k
                            ).collect()
                            ms = round(1000 * (time.perf_counter() - t0), 1)
                            print(json.dumps({
                                "needle": needle, "ignore_case": ci, "ms": ms,
                                "lines": [
                                    [int(r["doc_id"]), int(r["line_no"]),
                                     int(r["col"])]
                                    for r in rows
                                ],
                            }), flush=True)
                            continue
                        ids = server.grep(needle, case_insensitive=ci,
                                          limit=args.k)
                        ms = round(1000 * (time.perf_counter() - t0), 1)
                        print(json.dumps({
                            "needle": needle, "ignore_case": ci, "ms": ms,
                            "doc_ids": ids,
                        }), flush=True)
                finally:
                    if args.queries:
                        lines.close()
                    server.close()
                return 0
            if args.phrase:
                from bliss_rs_spark.operators.phrase import PhraseServer

                server = PhraseServer.from_store(spark, store)
                print(json.dumps({"ready": True, "mode": "phrase"}), flush=True)
            else:
                from bliss_rs_spark.operators.wand import WandServer

                server = WandServer.from_store(spark, store)
                print(json.dumps({"ready": True, "single_stage": server.single_stage,
                                  "units": len(server._units)}), flush=True)
            lines = open(args.queries) if args.queries else sys.stdin
            try:
                for line in lines:
                    text = line.strip()
                    if not text:
                        continue
                    if text == ":refresh":
                        # re-point the warm server at the store's CURRENT
                        # snapshot (after an out-of-band update), reusing
                        # every unchanged unit's cache
                        info = server.refresh(store)
                        print(json.dumps({"refreshed": True, **info}),
                              flush=True)
                        continue
                    if text.startswith(":suggest "):
                        # ":suggest <typo>" — did-you-mean over the live vocab
                        from bliss_rs_spark.operators.query_ops import (
                            suggest_terms,
                        )

                        typo = text[len(":suggest "):].strip()
                        rows = suggest_terms(
                            store.load(spark, "term_stats"), typo
                        ).collect()
                        print(json.dumps({
                            "suggest": typo,
                            "terms": [
                                {"term": r["term"], "dist": int(r["dist"]),
                                 "df": int(r["df"])}
                                for r in rows
                            ],
                        }), flush=True)
                        continue
                    if text.startswith(":filter "):
                        # ":filter <name> <column>=<value>" — register a
                        # named metadata filter from the store's doc_stats
                        # (allow sets computed distributed / broadcast once;
                        # works in BOTH serve modes)
                        from pyspark.sql import functions as F

                        _, name, pred = text.split(maxsplit=2)
                        col, val = pred.split("=", 1)
                        ds = store.load(spark, "doc_stats")
                        allow = ds.filter(F.col(col) == val).select("doc_id")
                        server.set_filter(name, allow)
                        print(json.dumps({"filter": name, "on": pred,
                                          "n_docs": allow.count()}),
                              flush=True)
                        continue
                    if text.startswith(":in "):
                        # ":in <name> <query>" — filtered top-k (BM25 score
                        # or phrase_tf depending on serve mode)
                        _, name, qtext = text.split(maxsplit=2)
                        t0 = time.perf_counter()
                        top = server.query(qtext, args.k, filter_name=name)
                        ms = round(1000 * (time.perf_counter() - t0), 1)
                        print(json.dumps({
                            "query": qtext, "filter": name, "ms": ms,
                            "results": [{"rank": i + 1, "doc_id": d, "score": s}
                                        for i, (d, s) in enumerate(top)],
                        }), flush=True)
                        continue
                    if args.phrase and text.startswith(":window "):
                        # proximity mode: minimal token window covering
                        # every query term (order-free), window ASC
                        qtext = text[len(":window "):]
                        t0 = time.perf_counter()
                        top = server.query_window(qtext, args.k)
                        ms = round(1000 * (time.perf_counter() - t0), 1)
                        print(json.dumps({
                            "query": qtext, "mode": "window", "ms": ms,
                            "results": [
                                {"rank": i + 1, "doc_id": d, "min_window": w}
                                for i, (d, w) in enumerate(top)
                            ],
                        }), flush=True)
                        continue
                    t0 = time.perf_counter()
                    top = server.query(text, args.k)
                    ms = round(1000 * (time.perf_counter() - t0), 1)
                    print(json.dumps({
                        "query": text, "ms": ms,
                        "results": [{"rank": i + 1, "doc_id": d, "score": s}
                                    for i, (d, s) in enumerate(top)],
                    }), flush=True)
            finally:
                if args.queries:
                    lines.close()
                server.close()
            return 0

        if args.cmd == "search":
            from bliss_rs_spark.plans.lifecycle import search_index

            out = search_index(spark, store, args.query, args.k).collect()
            print(json.dumps({
                "query": args.query,
                "results": [
                    {"rank": i + 1, "doc_id": int(r["doc_id"]),
                     "score": float(r["score"])}
                    for i, r in enumerate(out)
                ],
            }))
            return 0

        if args.cmd == "grep":
            from bliss_rs_spark.plans.lifecycle import regex_query, substring_query
            from bliss_rs_spark.sources.documents import load_documents

            docs = load_documents(spark, args.source, args.format)
            if "doc_id" not in docs.columns:
                from bliss_rs_spark.corpus import with_invariants

                docs = with_invariants(docs)
            if args.needle is not None and args.lines:
                # grep -n: file:line:col rows (line-level verify)
                from bliss_rs_spark.plans.lifecycle import substring_query_lines

                out = substring_query_lines(
                    spark, store, docs, args.needle,
                    case_insensitive=args.ignore_case,
                ).orderBy("doc_id", "line_no").limit(args.limit)
                name_col = "path" if "path" in docs.columns else None
                if name_col:
                    # a join does not preserve row order — re-sort after the
                    # path attach so the printed file:line:col order is
                    # deterministic (round-6 ADVICE)
                    out = out.join(
                        docs.select("doc_id", name_col), "doc_id", "left"
                    ).orderBy("doc_id", "line_no")
                for r in out.collect():
                    where = r[name_col] if name_col else str(r["doc_id"])
                    print(f"{where}:{r['line_no']}:{r['col']}:{r['line']}")
                return 0
            if args.needle is not None:
                out = substring_query(
                    spark, store, docs, args.needle,
                    case_insensitive=args.ignore_case,
                )
                what = {"needle": args.needle, "ignore_case": args.ignore_case}
            else:
                out = regex_query(spark, store, docs, args.regex)
                what = {"regex": args.regex}
            ids = [int(r["doc_id"]) for r in out.limit(args.limit).collect()]
            print(json.dumps({**what, "n_shown": len(ids), "doc_ids": sorted(ids)}))
            return 0

        if args.cmd == "compact":
            from bliss_rs_spark.plans.lifecycle import compact_full, compact_packs

            name = (compact_full if args.full else compact_packs)(spark, store)
            print(json.dumps({"snapshot": name, "full": bool(args.full),
                              "units": len(store.packed_units(spark))}))
            return 0

        if args.cmd == "maintain":
            from bliss_rs_spark.plans.lifecycle import maintain

            actions = maintain(spark, store)
            print(json.dumps({"actions": actions,
                              "snapshot": store.current_snapshot(),
                              "units": len(store.packed_units(spark))}))
            return 0

        if args.cmd == "migrate":
            from dataclasses import replace

            from bliss_rs_spark.plans.lifecycle import migrate

            new_cfg = replace(store.config(), analyzer_version=args.analyzer_version)
            docs = None
            if args.source:
                from bliss_rs_spark.sources.documents import load_documents

                docs = load_documents(spark, args.source, args.format)
            name = migrate(spark, store, new_cfg, docs=docs)
            print(json.dumps({"snapshot": name, "analyzer_version": args.analyzer_version}))
            return 0

        if args.cmd == "query":
            from bliss_rs_spark.plans.lifecycle import phrase_query, query_index

            if args.phrase:
                rows = phrase_query(spark, store, args.text, args.k).collect()
                results = [
                    {"rank": i + 1, "doc_id": r["doc_id"], "phrase_tf": r["phrase_tf"]}
                    for i, r in enumerate(rows)
                ]
            else:
                rows = query_index(
                    spark, store, args.text, args.k, use_wand=not args.exhaustive
                ).collect()
                results = [
                    {"rank": i + 1, "doc_id": r["doc_id"], "score": r["score"]}
                    for i, r in enumerate(rows)
                ]
            print(json.dumps({"query": args.text, "k": args.k, "results": results}))
            return 0
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
