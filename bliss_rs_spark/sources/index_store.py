"""Versioned on-disk index store: snapshot directories + atomic CURRENT pointer.

Iceberg-style semantics without the Iceberg dependency (the jar is not in
this image; the layout is designed so swapping the directory sink for
``spark.read.format("iceberg")`` tables is a one-module change):

    index_dir/
      CURRENT          -> "v00003"  (atomic os.replace of a one-line file)
      v00003/
        config.json    engine config + corpus stats + versions (the
                       BaseConfig analogue, /root/reference/src/library.rs:263-281)
        metrics.json   build metrics (docs/sec, postings/sec, skew ratio —
                       the progress-counter analogue, src/library.rs:1204-1287)
        doc_stats/     parquet
        postings/      parquet partitioned by term_bucket (query pruning)
        term_stats/    parquet
        packed/        parquet partitioned by shard (WAND path)
        manifest/      parquet: (doc_id, content_sha256, analyzer_version,
                       status) — the `analyzed` flag + upsert key analogue
                       (src/library.rs:512-516)
        errors/        parquet failure ledger (src/library.rs:1639-1668)
      _checkpoints/
        tokenized/     appended per build batch; the resumable intermediate
                       (SURVEY.md §4.4: per-partition checkpoints w/ lineage)

A reader always goes through CURRENT, so a killed writer leaves the store on
the previous snapshot (the transactional-upsert semantics of the reference's
per-song SQLite transactions, src/library.rs:1544-1633, at snapshot
granularity).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from bliss_rs_spark.config import IndexConfig

FRAMES = ("doc_stats", "postings", "term_stats", "packed", "doc_map",
          "positional", "manifest", "errors")


class IndexStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # --- snapshot pointer ----------------------------------------------------

    def current_snapshot(self) -> str | None:
        cur = os.path.join(self.path, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return f.read().strip() or None

    def _next_snapshot_name(self) -> str:
        # derive from max(existing snapshot dirs), not CURRENT+1: a crash
        # between os.replace(stage, final) and the CURRENT write leaves an
        # orphaned vNNNNN dir, and CURRENT+1 would then collide with it
        # forever (ENOTEMPTY on every later commit — store wedged)
        snaps = self.snapshots()
        cur = self.current_snapshot()
        hi = max(
            max((int(s[1:]) for s in snaps), default=0),
            int(cur[1:]) if cur else 0,
        )
        return f"v{hi + 1:05d}"

    def snapshot_dir(self, name: str | None = None) -> str:
        name = name or self.current_snapshot()
        if name is None:
            raise FileNotFoundError(f"no snapshot in index store {self.path}")
        return os.path.join(self.path, name)

    # --- read ------------------------------------------------------------------

    def meta(self) -> dict:
        with open(os.path.join(self.snapshot_dir(), "config.json")) as f:
            return json.load(f)

    def config(self) -> IndexConfig:
        return IndexConfig.from_json(json.dumps(self.meta()["config"]))

    def load(self, spark: SparkSession, frame: str) -> DataFrame:
        assert frame in FRAMES, frame
        return spark.read.parquet(os.path.join(self.snapshot_dir(), frame))

    # --- write -----------------------------------------------------------------

    def commit_snapshot(self, frames: dict[str, DataFrame], meta: dict,
                        metrics: dict | None = None) -> str:
        """Write all frames to a staging dir, then atomically flip CURRENT.

        A crash at any point before the final os.replace leaves the previous
        snapshot fully intact and readable.
        """
        name = self._next_snapshot_name()
        stage = os.path.join(self.path, f"_staging_{name}")
        if os.path.exists(stage):
            shutil.rmtree(stage)
        os.makedirs(stage)
        try:
            for fname, df in frames.items():
                assert fname in FRAMES, fname
                out = os.path.join(stage, fname)
                if fname in ("errors", "manifest", "term_stats"):
                    # guarantee at least one task so an empty frame still
                    # writes a schema-bearing parquet file (AQE can coalesce
                    # an empty shuffle to zero partitions otherwise)
                    df = df.coalesce(1) if fname == "errors" else df
                writer = df.write.mode("overwrite")
                if fname == "postings" and "term_bucket" in df.columns:
                    writer = df.sortWithinPartitions("term", "doc_id").write.mode(
                        "overwrite"
                    ).partitionBy("term_bucket")
                elif fname == "positional" and "term_bucket" in df.columns:
                    writer = df.sortWithinPartitions("term", "doc_id").write.mode(
                        "overwrite"
                    ).partitionBy("term_bucket")
                elif fname == "packed" and "shard" in df.columns:
                    writer = df.sortWithinPartitions("term").write.mode(
                        "overwrite"
                    ).partitionBy("shard")
                writer.parquet(out)
            with open(os.path.join(stage, "config.json"), "w") as f:
                json.dump(meta, f, indent=2, sort_keys=True)
            with open(os.path.join(stage, "metrics.json"), "w") as f:
                json.dump(metrics or {}, f, indent=2, sort_keys=True)
            final = os.path.join(self.path, name)
            os.replace(stage, final)
        except BaseException:
            shutil.rmtree(stage, ignore_errors=True)
            raise
        tmp = os.path.join(self.path, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, os.path.join(self.path, "CURRENT"))
        return name

    # --- maintenance ------------------------------------------------------------

    def snapshots(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit()
        )

    def gc(self, keep_last: int = 2) -> list[str]:
        """Expire old snapshots (Iceberg expire_snapshots analogue), never
        touching CURRENT or anything newer than the retention window."""
        cur = self.current_snapshot()
        snaps = self.snapshots()
        keep = set(snaps[-keep_last:])
        if cur:
            keep.add(cur)
        removed = []
        for s in snaps:
            if s not in keep:
                shutil.rmtree(os.path.join(self.path, s), ignore_errors=True)
                removed.append(s)
        return removed

    # --- tokenize checkpoint (resumability) --------------------------------------

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.path, "_checkpoints", "tokenized")

    def has_checkpoint(self) -> bool:
        d = self.checkpoint_dir
        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d)
        )

    def load_checkpoint(self, spark: SparkSession) -> DataFrame | None:
        if not self.has_checkpoint():
            return None
        return spark.read.parquet(self.checkpoint_dir)

    def append_checkpoint(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.checkpoint_dir)

    def clear_checkpoint(self) -> None:
        shutil.rmtree(os.path.join(self.path, "_checkpoints"), ignore_errors=True)

    def compact_checkpoint(self, spark: SparkSession, target_partitions: int = 32) -> None:
        """Rewrite the append-accumulated checkpoint into ``target_partitions``
        files (small-file compaction, the Iceberg rewrite_data_files
        analogue).  Atomic: written to a sibling dir, then swapped."""
        ckpt = self.load_checkpoint(spark)
        if ckpt is None:
            return
        tmp = self.checkpoint_dir + "_compact"
        shutil.rmtree(tmp, ignore_errors=True)
        ckpt.repartition(target_partitions).write.parquet(tmp)
        old = self.checkpoint_dir + "_old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(self.checkpoint_dir, old)
        os.replace(tmp, self.checkpoint_dir)
        shutil.rmtree(old, ignore_errors=True)
