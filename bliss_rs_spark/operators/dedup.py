"""Deduplication operators for large-scale corpus curation.

Reference parity: bliss-rs's playlist dedup treats two rows as duplicates if
their distance is below a threshold OR their (title, artist) metadata matches
exactly (/root/reference/src/playlist.rs:367-402).  That is precisely the
exact-tier (metadata/sha equality) + near-tier (threshold on a similarity
score) split implemented here at corpus scale:

- exact:      content_sha256 groupBy (hash-equality dedup)
- normalized: md5 fingerprint of the canonical token stream
- near:       MinHash+LSH over word-3-gram shingles (banding -> bucket join
              -> exact Jaccard verify), SimHash hamming buckets, and
              n-gram Jaccard for small candidate sets
- embedding:  cosine near-dup over the embeddings table (operators/similarity.py)

All hash arithmetic uses the md5-derived 60-bit integers of
functions/text_stats.py so the DuckDB oracle can replay every step
bit-for-bit.  Scale notes inline: every step is a narrow map or an
equi-shuffle on a bounded key; no O(n^2) stage ever materializes — candidate
pairs come from bucket joins only (the LSH contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bliss_rs_spark.functions.text_stats import (
    fingerprint_spark,
    md5_int64_spark,
    shingles_spark,
)


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical documents: (content_sha256, n_docs, min_doc_id).

    One partial+final count per sha — the canonical hash-groupBy dedup.
    """
    return (
        docs.groupBy("content_sha256")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep one representative (min doc_id) per content_sha256.

    Window-free formulation: groupBy + semi-join keeps the build shuffle-light
    (two stages, both on the sha key, co-partitioned by AQE).
    """
    keep = docs.groupBy("content_sha256").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep, ["content_sha256", "doc_id"], "left_semi")


def with_fingerprint(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Normalized-content fingerprint column (whitespace/case/punct-insensitive)."""
    return docs.withColumn("fingerprint", F.expr(fingerprint_spark(content_col)))


def with_shingles(docs: DataFrame, content_col: str = "content", n: int = 3) -> DataFrame:
    return docs.withColumn("shingles", F.expr(shingles_spark(content_col, n)))


def _minhash_exprs_spark(n_hashes: int) -> list[str]:
    """n_hashes 32-bit hash expressions per shingle, sliced from ceil(n/4)
    salted md5 digests (md5 = 128 bits = 4x32; salt i prefixes 'i:').
    2 digests feed 8 permutations — 4x fewer hash computations than
    hash-per-permutation, still exactly mirrorable in DuckDB."""
    out = []
    for p in range(n_hashes):
        digest, slot = divmod(p, 4)
        src = "shingle" if digest == 0 else f"concat('{digest}:', shingle)"
        out.append(
            f"cast(conv(substr(md5({src}), {1 + 8 * slot}, 8), 16, 10) as bigint)"
        )
    return out


def _minhash_exprs_duckdb(n_hashes: int) -> list[str]:
    out = []
    for p in range(n_hashes):
        digest, slot = divmod(p, 4)
        src = "shingle" if digest == 0 else f"'{digest}:' || shingle"
        out.append(f"('0x' || substr(md5({src}), {1 + 8 * slot}, 8))::bigint")
    return out


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 8, content_col: str = "content", n: int = 3
) -> DataFrame:
    """(doc_id, perm, minhash): MinHash signature rows.

    One shingle explode, ONE aggregation computing all n_hashes mins as
    separate columns (map-side combine absorbs the fan-in), then an unpivot
    back to long form.  Hash values are 32-bit slices of salted md5 digests
    (_minhash_exprs_spark) — SQL-mirrorable, no 64-bit modmul.
    Docs with fewer than n tokens produce no signature (no shingles).

    Measured dead end (round 3): replacing explode+groupBy with
    ``array_min(transform(shingles, s -> hash))`` — zero shuffles on paper —
    is 2.2x SLOWER in practice: Spark evaluates higher-order functions
    outside whole-stage codegen and materializes one array per permutation,
    while this formulation hashes inside codegen and the groupBy shuffle is
    tiny (post-combine, one row per doc x permutation).  Keep the explode.
    """
    sh = with_shingles(docs, content_col, n).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    aggs = [
        F.min(F.expr(e)).alias(f"m{p}")
        for p, e in enumerate(_minhash_exprs_spark(n_hashes))
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    stack = ", ".join(f"{p}, m{p}" for p in range(n_hashes))
    return wide.selectExpr(
        "doc_id", f"stack({n_hashes}, {stack}) as (perm, minhash)"
    ).select("doc_id", F.col("perm").cast("int").alias("perm"), "minhash")


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    content_col: str = "content",
    n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding: (doc_a, doc_b, jaccard).

    Stage 1: signatures; stage 2: band keys (concat of rows-per-band
    minhashes) -> bucket self-join produces candidates; stage 3: exact
    word-shingle Jaccard verification >= threshold.  The self-join is on the
    band bucket key, so the only quadratic blow-up possible is within a
    bucket of true near-dups — the LSH guarantee.
    """
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands

    sig = minhash_signatures(docs, n_hashes, content_col, n)
    band_keys = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws("_", F.sort_array(F.collect_list(F.col("minhash")))).alias("bkey"))
    )
    # candidate pairs by GROUPING each (band, bkey) bucket and exploding the
    # within-bucket pairs — identical pair set to the former band_keys
    # self-join, but the signature pipeline (shingle explode + 8-way min agg)
    # is computed ONCE instead of once per join side (the self-join's build
    # side sat under a BroadcastExchange, so no ReusedExchange applied;
    # plans/r07/minhash_lsh_pairs_before.txt shows both full pipelines).
    # Bucket arrays are LSH-bounded (a bucket is a near-dup cluster), so the
    # within-bucket explode is the same quadratic the join already paid.
    cand = (
        band_keys.groupBy("band", "bkey")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )

    # verify with HASHED shingle sets: ship int64 md5 slices to the candidate
    # join instead of raw shingle strings — ~an order of magnitude less
    # payload per doc at corpus scale, same Jaccard (shingles are distinct;
    # the identical hashing is replayed in the DuckDB oracle, so parity stays
    # bit-exact even in the astronomically-unlikely collision case)
    hash_arr = f"transform(shingles, s -> {md5_int64_spark('s')})"
    sh = with_shingles(docs, content_col, n).select(
        "doc_id", F.expr(hash_arr).alias("shingles")
    )
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.when(
                F.size(F.array_union("sh_a", "sh_b")) == 0, F.lit(0.0)
            ).otherwise(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, component) over the near-dup pair graph — component = the
    smallest doc_id reachable.  The cluster-formation step a production
    dedup pipeline needs between pair emission and keep-one: near-dup is
    not transitive, so picking survivors from PAIRS alone either drops too
    much (both ends) or too little (greedy).

    Distributed hash-to-min label propagation: each round every node takes
    the min label among itself and its neighbors (one join + one groupBy
    per round, all equi-shuffles on the node key); converges in
    graph-diameter rounds — near-dup clusters are shallow (diameter ~2-4),
    so 3-5 rounds in practice, never O(n) anything.  Lineage is truncated
    every round (localCheckpoint) — iterative plans otherwise grow
    exponentially and stall the driver; on a real cluster point
    spark.checkpoint.dir at durable storage and swap in checkpoint() if
    executor loss during the loop must be survivable.  Deterministic:
    min() is order- and partitioning-insensitive.
    """
    edges = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = (
        edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), "label"), "v"
            ).select("u", "label")
        )
        new_labels = (
            labels.unionByName(nbr_min)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # round-4 ADVICE fix: silently-wrong partial labels on a graph with
        # diameter > max_iter would make near_dedup_keep_one keep extra
        # duplicates with no signal — surface it
        import warnings

        warnings.warn(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds (component diameter exceeds it); labels are "
            f"PARTIAL — rerun with a larger max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("component"))


def near_dedup_keep_one(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Drop every near-duplicate except its cluster representative (the
    smallest doc_id of each connected component); docs in no pair survive
    untouched.  The near-tier counterpart of dedup_exact."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


def ngram_jaccard_pairs(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    content_col: str = "content",
    n: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard pairs via an inverted shingle join (no LSH).

    Candidates = pairs sharing at least one shingle; exact for any threshold
    > 0 but the shingle join can blow up on corpora with globally-hot
    shingles — use minhash_lsh_pairs at scale; this operator doubles as its
    correctness oracle.
    """
    sh = with_shingles(docs, content_col, n).select("doc_id", "shingles")
    exploded = sh.select("doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle"))
    inter = (
        exploded.alias("x")
        .join(exploded.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.n_sh").alias("na"),
            F.col("y.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard", F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    content_col: str = "content",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into max_hamming + 1
    bands; two fingerprints within hamming distance max_hamming must agree
    on at least one band (pigeonhole — recall is exactly 1 for emitted
    pairs), so candidates come from band-bucket self-joins (union, distinct)
    and are then verified with an exact popcount — never an all-pairs scan.
    Default max_hamming=3 gives the classic 4 x 16-bit split.
    All JVM bit arithmetic, so the DuckDB oracle replays it exactly.
    """
    n_bands = max_hamming + 1
    if not 1 <= n_bands <= 16:
        raise ValueError(
            f"max_hamming={max_hamming}: need 0 <= max_hamming <= 15 so each "
            "of the max_hamming+1 pigeonhole bands keeps >= 4 bits"
        )
    width = 64 // n_bands
    sh = simhash64(docs, content_col)
    bands = None
    for i in range(n_bands):
        w = width if i < n_bands - 1 else 64 - width * (n_bands - 1)
        start = i * width
        bexpr = (
            "simhash" if w >= 64
            else f"(simhash >> {start}) & {(1 << w) - 1}"
        )
        b = sh.select(
            "doc_id",
            "simhash",
            F.lit(i).alias("band"),
            F.expr(bexpr).alias("bkey"),
        )
        bands = b if bands is None else bands.unionByName(b)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bkey"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )


def bottomk_fingerprint(
    docs: DataFrame, k: int = 8, n: int = 5, content_col: str = "content"
) -> DataFrame:
    """Winnowing-style document fingerprint: the k smallest hashes of the
    doc's rolling n-token windows (bottom-k sketch; Schleimer et al.'s
    winnowing family — public literature).  Output one row per (doc_id,
    rank, fp_hash), rank 1..k ascending — join-able for plagiarism-style
    overlap detection; two docs sharing most fingerprints are near-dups.
    """
    from pyspark.sql import Window as W

    sh = with_shingles(docs, content_col, n).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    hashed = sh.withColumn("fp_hash", F.expr(md5_int64_spark("shingle")))
    w = W.partitionBy("doc_id").orderBy(F.asc("fp_hash"))
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "fp_hash")
    )


def simhash64(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash of the tf-weighted token stream.

    bit_j(doc) = 1 iff sum over terms of tf * sign(bit_j(h(term))) > 0,
    h = md5_int64 (60 effective bits; top 4 always 0 — acceptable, documented).
    Built entirely from JVM expressions as 64 parallel SUM columns over one
    groupBy(doc_id) — the minhash wide-agg idiom.  The previous shape
    exploded ``sequence(0, 63)`` per (doc, term) row (64x the row count
    through a Generate) and paid an extra (doc, bit) exchange; the wide agg
    evaluates the same 64 conditional sums inside codegen with map-side
    partial aggregation and one fewer shuffle (guide §2.3/§2.4; identical
    integer arithmetic, bit-exact to the DuckDB oracle).
    """
    from bliss_rs_spark.functions.tokenizer import tokenize_sql_spark

    toks = (
        docs.select("doc_id", F.explode(F.expr(tokenize_sql_spark(content_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.expr(md5_int64_spark("term")))
    )
    sums = [
        F.sum(
            F.expr(f"case when (shiftright(h, {j}) & 1) = 1 then tf else -tf end")
        ).alias(f"s{j}")
        for j in range(64)
    ]
    bitvals = " + ".join(
        f"(case when s{j} > 0 then shiftleft(cast(1 as bigint), {j}) "
        f"else cast(0 as bigint) end)"
        for j in range(64)
    )
    return (
        toks.groupBy("doc_id")
        .agg(*sums)
        .select("doc_id", F.expr(bitvals).alias("simhash"))
    )
