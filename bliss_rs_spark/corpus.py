"""Deterministic synthetic source-code corpus + testdata adapter.

The engine's authoritative input shape is BASELINE.json ``input_hint``:
``documents(repo string, path string, commit string, lang string,
content string)``.  ``synth_documents`` generates that shape distributed
(spark.range -> mapInPandas; each row derived purely from (seed, id), so any
partitioning produces identical rows — the determinism requirement of
SURVEY.md §7.4) and ``documents_from_testdata`` adapts the driver's
``/root/testdata/sf*/documents.parquet`` (doc_id, text, lang, source,
n_chars) into the same shape so oracle-checked queries run over driver data.

Reference parity: the corpus-with-known-properties move mirrors bliss-rs's
fixture corpus (chord wavs whose dominant feature is known,
/root/reference/src/chroma.rs:716-806): we plant forced-hot terms (skew
tests), exact duplicates (dedup tests) and camelCase-only matches
(tokenizer tests) at deterministic positions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "repo string, path string, commit string, lang string, content string"

LANGS = ["rust", "python", "java", "go", "c"]

_KEYWORDS = {
    "rust": ["fn", "impl", "let", "match", "pub", "struct", "return"],
    "python": ["def", "class", "return", "import", "self", "yield"],
    "java": ["public", "class", "void", "static", "return", "new"],
    "go": ["func", "type", "struct", "return", "defer", "chan"],
    "c": ["int", "void", "return", "struct", "static", "sizeof"],
}

# Forced-hot terms present in a large fraction of documents (skew fixture).
HOT_TERMS = ["return", "value", "data"]

_CAMEL_IDS = [
    "parseHtmlDocument", "buildIndexShard", "mergeSortedRuns", "readFileSync",
    "tokenStreamFactory", "blockMaxScore", "postingListWriter", "queryPlanNode",
]
_SNAKE_IDS = [
    "posting_block_codec", "term_stats_cache", "doc_shard_router",
    "varbyte_encode_u64", "bm25_partial_score", "index_manifest_row",
]
_WORDS = [
    "buffer", "cursor", "offset", "length", "stream", "shard", "bucket",
    "merge", "score", "query", "index", "token", "block", "delta", "cache",
    "batch", "commit", "handle", "writer", "reader", "config", "error",
]


def _doc_content(rng: np.random.Generator, lang: str, i: int) -> str:
    """One synthetic source file, fully determined by the rng state."""
    kws = _KEYWORDS[lang]
    n_lines = int(rng.integers(3, 25))
    lines = []
    for _ in range(n_lines):
        pieces = [kws[int(rng.integers(0, len(kws)))]]
        if rng.random() < 0.6:
            pieces.append(_CAMEL_IDS[int(rng.integers(0, len(_CAMEL_IDS)))])
        if rng.random() < 0.6:
            pieces.append(_SNAKE_IDS[int(rng.integers(0, len(_SNAKE_IDS)))])
        for _ in range(int(rng.integers(1, 6))):
            pieces.append(_WORDS[int(rng.integers(0, len(_WORDS)))])
        if rng.random() < 0.5:
            pieces.append(HOT_TERMS[int(rng.integers(0, len(HOT_TERMS)))])
        lines.append(" ".join(pieces) + ";")
    # a rare identifier unique to ~1/50 docs, for rare-term queries
    if i % 50 == 0:
        lines.append(f"let rareNeedle{i // 50} = 1;")
    return "\n".join(lines)


def _rows_for_ids(ids: np.ndarray, seed: int) -> pd.DataFrame:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in ids:
        i = int(i)
        # per-row rng: independent of partitioning
        rng = np.random.default_rng((seed, i))
        # zipf-ish repo sizes: repo index grows sub-linearly
        org = i % 7
        repo_idx = int(np.sqrt(i)) % 23
        lang = LANGS[i % len(LANGS)]
        ext = {"rust": "rs", "python": "py", "java": "java", "go": "go", "c": "c"}[lang]
        content = _doc_content(rng, lang, i)
        # plant exact duplicates: every 97th doc clones doc i-1's content
        # (i-1 is never itself a multiple of 97, so its content is original)
        if i % 97 == 0 and i >= 97:
            dup_rng = np.random.default_rng((seed, i - 1))
            dup_lang = LANGS[(i - 1) % len(LANGS)]
            content = _doc_content(dup_rng, dup_lang, i - 1)
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        rows["repo"].append(f"org{org}/repo{repo_idx}")
        rows["path"].append(f"src/module_{i % 13}/file_{i}.{ext}")
        rows["commit"].append(commit)
        rows["lang"].append(lang)
        rows["content"].append(content)
    return pd.DataFrame(rows)


def synth_documents(
    spark: SparkSession, n_docs: int, seed: int = 42, n_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus in input_hint shape.

    Scales to any n_docs: generation is a narrow mapInPandas over
    ``spark.range`` — no driver-side materialization, no shuffle.
    """
    if n_partitions is None:
        n_partitions = max(1, min(32, n_docs // 256 or 1))
    base = spark.range(0, n_docs, 1, n_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _rows_for_ids(pdf["id"].values, seed)

    return base.mapInPandas(gen, schema=DOCS_SCHEMA)


def with_invariants(docs: DataFrame) -> DataFrame:
    """Append ``doc_id`` and the ``content_sha256`` row invariant.

    doc_id = xxhash64(repo, path, commit): the UNIQUE-path primary key
    analogue (/root/reference/src/library.rs:512 ``path text not null unique``);
    content_sha256 is the canonical-form checksum analogue
    (/root/reference/src/song/decoder.rs:119-128).  Both built-in JVM
    functions — no UDF.
    """
    return docs.withColumn("doc_id", F.xxhash64("repo", "path", "commit")).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )


FILE_MARKER = "\n===FILE:"


def pack_repo_blobs(docs: DataFrame) -> DataFrame:
    """Inverse fixture for explode_repo_blobs: concatenate each repo's files
    into one container blob (`===FILE:<commit>|<path>===\\n<content>`)."""
    return docs.groupBy("repo").agg(
        F.concat_ws(
            "",
            F.collect_list(
                F.concat(
                    F.lit(FILE_MARKER),
                    F.col("commit"),
                    F.lit("|"),
                    F.col("path"),
                    F.lit("===\n"),
                    F.col("content"),
                )
            ),
        ).alias("blob"),
        F.count(F.lit(1)).alias("n_files"),
    )


def explode_repo_blobs(blobs: DataFrame) -> DataFrame:
    """Container explode: one repo blob -> N per-file document rows with a
    provenance struct — the reference's CUE sheet handling (one container
    audio file -> many Song rows each carrying CueInfo provenance,
    /root/reference/src/cue.rs:74-107, slicing at :208-245).

    Pure JVM: split on the file marker, posexplode for the per-file ordinal
    (the track-number analogue), regexp for the path header.
    """
    parts = F.split(F.col("blob"), F.lit(FILE_MARKER))
    exploded = blobs.select(
        "repo",
        "n_files",
        F.posexplode(parts).alias("pos", "chunk"),
    ).filter(F.col("pos") > 0)  # chunk 0 is the empty prefix before the first marker
    return exploded.select(
        "repo",
        F.regexp_extract("chunk", r"^([0-9a-f]+)\|", 1).alias("commit"),
        F.regexp_extract("chunk", r"^[0-9a-f]+\|(.*?)===\n", 1).alias("path"),
        F.regexp_replace("chunk", r"^[0-9a-f]+\|(.*?)===\n", "").alias("content"),
        F.struct(
            F.col("pos").alias("ordinal"),
            F.col("n_files").alias("container_files"),
            F.lit("repo_blob").alias("container_kind"),
        ).alias("provenance"),
    )


def documents_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents table to input_hint shape.

    Keeps the native integer ``doc_id`` (so DuckDB oracle queries can join on
    it) instead of the xxhash64 derivation used for synthetic corpora.
    """
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        raw.select(
            F.col("source").alias("repo"),
            F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("path"),
            F.sha2(F.concat_ws(":", F.lit("commit"), F.col("doc_id").cast("string")), 256)
            .substr(1, 40)
            .alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
            F.col("doc_id"),
        )
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
