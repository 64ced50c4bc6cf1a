"""Similarity search over an embedding column (array<float>).

Reference parity: bliss-rs's whole query engine is metric top-k over dense
vectors (euclidean over 23-float analyses, /root/reference/src/playlist.rs:
61-72, ranked in closest_to_songs :256-270).  Here the same shape over an
``embeddings(vec_id long, embedding array<float>, label int)`` table:

- brute-force cosine top-k  — the exact baseline (one narrow pass + global
  top-k merge; at 100 TB this is the scan you run when recall must be 1.0)
- LSH-bucketed ANN          — random-hyperplane signs bucket the vectors;
  query probes its own bucket (and optionally neighbors), scoring only the
  bucket members: the scale path.  Hyperplanes are seeded, so bucketing is
  deterministic and resumable.

Cosine math stays in JVM expressions (zip_with + aggregate in float64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k of a literal query vector.

    The query vector is a literal array (constant-folded; no join at all).
    Plan: narrow projection -> global top-k (orderBy.limit = per-partition
    top-k + driver merge).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cosine_topk_by_id(
    emb: DataFrame, query_id: int, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Top-k neighbors of a stored vector (excluded from its own result)."""
    qrow = emb.filter(F.col(id_col) == query_id).select(vec_col).collect()
    if not qrow:
        return emb.sparkSession.createDataFrame([], f"{id_col} long, cosine double")
    vec = [float(x) for x in qrow[0][0]]
    return cosine_topk(emb.filter(F.col(id_col) != query_id), vec, k, vec_col, id_col)


def hyperplanes(n_planes: int = 12, seed: int = 7, dim: int = 64) -> np.ndarray:
    """Seeded random hyperplanes shared by the Spark operator and the DuckDB
    oracle (emitted there as literal double arrays — same float64 values)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def auto_lsh_params(
    n_vectors: int,
    cosine_threshold: float = 0.95,
    recall_target: float = 0.8,
    target_bucket_size: int = 64,
    min_rows: int = 3,
    max_rows: int = 24,
    max_bands: int = 32,
) -> tuple[int, int]:
    """(n_planes, bands) scaled to corpus size — the round-2 parameter risk:
    a FIXED r=3 planes/band gives only 8 buckets/band, so candidate pairs
    grow ~n^2/128 and the bucket join explodes at corpus scale.

    rows/band r is chosen so each band has ~n/target_bucket_size buckets
    (2^r >= n / target_bucket_size): expected bucket size stays ~constant
    and candidate pairs grow ~O(n * target_bucket_size * bands), linear in
    n.  bands then come from the S-curve P[candidate] = 1-(1-p^r)^b with
    p = 1 - theta/pi (theta = arccos(threshold)): the smallest b reaching
    ``recall_target`` at the threshold.  BOTH knobs are bounded: r is capped
    (p^r underflow makes b explode) and b is capped at ``max_bands`` (each
    band is n_planes/bands literal projection expressions in the plan —
    unbounded b is the same driver plan-blowup class as the old ivf_assign
    when-chain).  When the b the S-curve asks for exceeds max_bands, r is
    walked DOWN first (bigger buckets == the documented grow-
    target_bucket_size fallback: verification cost per vector rises but
    stays linear, recall target holds); only at r == min_rows is b finally
    clamped, trading recall."""
    import math

    n = max(int(n_vectors), 1)
    r = int(math.ceil(math.log2(max(n / max(target_bucket_size, 1), 2.0))))
    r = max(min_rows, min(max_rows, r))
    p = 1.0 - math.acos(min(max(cosine_threshold, -1.0), 1.0)) / math.pi

    def bands_for(rows: int) -> int:
        pr = p**rows
        if pr >= 1.0:
            return 1
        return max(
            int(
                math.ceil(
                    math.log(max(1.0 - recall_target, 1e-12))
                    / math.log(1.0 - pr)
                )
            ),
            1,
        )

    b = bands_for(r)
    while b > max_bands and r > min_rows:
        r -= 1
        b = bands_for(r)
    b = min(b, max_bands)
    return r * b, b


def _banded_keys(
    emb: DataFrame,
    n_planes: int,
    bands: int,
    seed: int,
    dim: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, band, bkey) — each vector's per-band bucket key (the sign bits
    of its band's hyperplane projections).  Shared by the pair search and
    the bucket-size metrics so both see exactly the same bucketing."""
    assert n_planes % bands == 0
    rows_per_band = n_planes // bands
    planes = hyperplanes(n_planes, seed, dim)
    bits = [
        F.when(
            _dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in planes[i]])) >= 0,
            "1",
        ).otherwise("0")
        for i in range(n_planes)
    ]
    banded = None
    for bi in range(bands):
        key = F.concat_ws("", *bits[bi * rows_per_band : (bi + 1) * rows_per_band])
        part = emb.select(
            F.col(id_col), F.lit(bi).alias("band"), key.alias("bkey")
        )
        banded = part if banded is None else banded.unionByName(part)
    return banded


def lsh_bucket_stats(
    emb: DataFrame,
    n_planes: int = 12,
    bands: int = 4,
    seed: int = 7,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Bucket-size metrics for a banding choice — the candidate-blowup
    early-warning the scale path needs BEFORE running the bucket join:
    ``candidate_pairs`` is the exact pre-dedup join size (sum of c*(c-1)/2
    over buckets); ``skew_ratio`` = max/mean bucket size (a hot bucket is a
    hot join key).  One aggregation job over the banded keys."""
    per_bucket = _banded_keys(
        emb, n_planes, bands, seed, dim, vec_col, id_col
    ).groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("c"))
    row = per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").alias("mx"),
        F.avg("c").alias("mean"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
    ).collect()[0]
    return {
        "n_planes": n_planes,
        "bands": bands,
        "rows_per_band": n_planes // bands,
        "n_buckets": int(row["n_buckets"] or 0),
        "max_bucket": int(row["mx"] or 0),
        "mean_bucket": float(row["mean"] or 0.0),
        "skew_ratio": (float(row["mx"]) / float(row["mean"]))
        if row["mean"] else 1.0,
        "candidate_pairs": int(row["pairs"] or 0),
    }


def embedding_neardup_pairs(
    emb: DataFrame,
    cosine_threshold: float = 0.95,
    n_planes: int | None = None,
    bands: int | None = None,
    seed: int = 7,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    recall_target: float = 0.8,
    target_bucket_size: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED hyperplane LSH.

    The n_planes sign bits are split into ``bands`` bands of
    n_planes/bands planes; vectors agreeing on ALL bits of ANY band become a
    candidate pair (union over band buckets, distinct), then the exact cosine
    filter verifies.  Banding trades precision for recall exactly like the
    MinHash banding path (operators/dedup.py) — P[candidate] = 1-(1-p^r)^b
    with p = 1 - theta/pi.  Emitted pairs are exact (verified); recall < 1
    only from vectors where every band has a sign flip.

    With ``n_planes``/``bands`` unset (the default), parameters AUTO-SCALE
    to the corpus via auto_lsh_params: rows/band grows ~log2(n) so expected
    bucket size (and hence the bucket join) stays linear in n, and bands
    grow to hold ``recall_target`` at the threshold.  Fixed small r is the
    100 TB trap: 2^3 buckets/band means ~n^2/128 candidate pairs.
    """
    if n_planes is None or bands is None:
        np_auto, b_auto = auto_lsh_params(
            emb.count(), cosine_threshold, recall_target, target_bucket_size
        )
        r_auto = np_auto // b_auto
        if n_planes is None and bands is None:
            n_planes, bands = np_auto, b_auto
        elif n_planes is None:
            # bands given: auto rows/band x the caller's band count
            n_planes = r_auto * bands
        else:
            # n_planes given (round-4 ADVICE fix: the explicit value was
            # previously discarded): derive bands from it at the auto
            # rows/band, rounding n_planes DOWN to a whole number of bands
            rows = max(min(r_auto, n_planes), 1)
            bands = max(n_planes // rows, 1)
            n_planes = (n_planes // bands) * bands
    banded = _banded_keys(emb, n_planes, bands, seed, dim, vec_col, id_col)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    v = emb.select(F.col(id_col), F.col(vec_col))
    va = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_random_codebook(n_cells: int = 16, seed: int = 11, dim: int = 64) -> np.ndarray:
    """Seeded, normalized random codebook — deterministic plan-shape default;
    shared with the DuckDB oracle as literal double arrays.  Use
    kmeans_codebook for data-adapted cells (better balance/recall)."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def _seq_dot(a, b) -> float:
    """Sequential left-to-right float64 dot — bitwise-identical to Spark's
    F.aggregate fold and DuckDB's list_dot_product loop (numpy's pairwise/
    SIMD `@` is NOT, which breaks oracle tie-breaks at rounding boundaries)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    seed: int = 11,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its max-cosine centroid
    (argmax over a literal broadcast centroid set; ties pick the lowest cell).

    ``centroids`` defaults to the seeded random codebook; pass
    ``kmeans_codebook(...)`` output for data-adapted cells.
    """
    cents = centroids if centroids is not None else ivf_random_codebook(n_cells, seed, dim)
    n_cells = len(cents)
    # argmax via array_max over (cos, -cell) structs: each centroid's dot
    # expression appears exactly ONCE in the plan.  The previous
    # greatest + when-chain formulation inlined all n_cells dot expressions
    # into every branch after projection collapse — an O(n_cells^2 x dim)
    # expression tree that OOMed the driver once the batch path stacked
    # joins and a window on top.  Struct comparison = max cos, ties -> max
    # negcell = LOWEST cell, identical semantics.
    entries = [
        F.struct(
            (
                _dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in cents[i]]))
                / F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))
            ).alias("cos"),
            F.lit(-i).alias("negcell"),
        )
        for i in range(n_cells)
    ]
    best = F.array_max(F.array(*entries))
    return emb.select(
        F.col(id_col), F.col(vec_col), (-best["negcell"]).cast("int").alias("cell")
    )


def score_with_model(
    emb: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Score rows with a broadcast trained model (F3 parity: bliss-rs's
    isolation-forest DistanceMetric scores candidate rows with a model built
    from the seeds, /root/reference/src/playlist.rs:230-251).

    The model (a weight vector here; any picklable scorer in general) ships
    once per executor via the UDF closure; scoring is vectorized across the
    Arrow batch.  The dot product accumulates dimension-by-dimension in
    float64 (column-vectorized over rows) rather than via numpy's
    pairwise-summed ``@`` so the result is bitwise-identical to a sequential
    SQL fold (DuckDB list_dot_product) — the oracle-parity requirement.
    """
    w = np.asarray(weights, dtype=np.float64)
    b = float(bias)

    @F.pandas_udf("double")
    def model_score(v: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        z = np.zeros(len(mat), dtype=np.float64)
        for j in range(mat.shape[1]):  # sequential over dims, vectorized over rows
            z += mat[:, j] * w[j]
        z += b
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return emb.select(F.col(id_col), model_score(F.col(vec_col)).alias("model_score"))


def greedy_chain(
    emb: DataFrame,
    start_id: int,
    steps: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, int]]:
    """Iterative nearest-neighbor chain: repeatedly hop to the closest
    unvisited vector (the reference's song_to_song playlist ordering:
    repeated argmin with pool removal, /root/reference/src/playlist.rs:
    272-326).  Inherently sequential -> a driver loop of `steps` top-1
    queries over a cached DataFrame; each hop is one Spark job.

    Returns [(step, vec_id)] with step 0 = start.
    """
    emb = emb.select(id_col, vec_col).cache()
    visited = [start_id]
    out = [(0, start_id)]
    cur_vec = [float(x) for x in emb.filter(F.col(id_col) == start_id).collect()[0][1]]
    for step in range(1, steps + 1):
        nxt = (
            cosine_topk(emb.filter(~F.col(id_col).isin(visited)), cur_vec, 1, vec_col, id_col)
        ).collect()
        if not nxt:
            break
        nid = int(nxt[0][0])
        out.append((step, nid))
        visited.append(nid)
        cur_vec = [float(x) for x in emb.filter(F.col(id_col) == nid).collect()[0][1]]
    return out


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: score only vectors in the n_probe cells nearest the
    query.  Same top-k contract as cosine_topk, recall < 1 (ANN).

    Probe cells are ranked by sequential dot(centroid, query) (cosine order
    is identical — centroid norms cancel only in rank, and the query norm is
    a common factor), tie-broken on the cell index, so the DuckDB oracle's
    ``ORDER BY list_dot_product(c, qe) DESC, cell ASC LIMIT n_probe``
    reproduces the probe set bit-for-bit.
    """
    cents = centroids if centroids is not None else ivf_random_codebook(n_cells, seed, dim)
    scores = [_seq_dot(c, query_vec) for c in cents]
    order = sorted(range(len(cents)), key=lambda i: (-scores[i], i))
    probe = order[:n_probe]
    assigned = ivf_assign(emb, len(cents), seed, dim, vec_col, id_col, centroids=cents)
    cand = assigned.filter(F.col("cell").isin(probe)).select(id_col, vec_col)
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ivf_topk_batch(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN for a whole query SET in ONE Spark job (the embedding-space
    counterpart of wand_topk_batch): assign vectors to cells once, broadcast
    the per-query probe sets and query vectors, score only probed cells, and
    finish each query with a rank window.  Returns
    (query_id, rank, vec_id, cosine).

    Per-query cost is candidate scoring, not job scheduling — batch ANN over
    N queries scans the corpus once instead of N times.  All cosine math is
    sequential-fold float64 (zip_with/aggregate), so the DuckDB oracle is
    bit-identical."""
    from pyspark.sql import Window as W

    spark = emb.sparkSession
    cents = centroids if centroids is not None else ivf_random_codebook(n_cells, seed, dim)
    probe_rows = []
    for qid, qv in queries:
        scores = [_seq_dot(c, qv) for c in cents]
        order = sorted(range(len(cents)), key=lambda i: (-scores[i], i))
        probe_rows += [(int(qid), int(c)) for c in order[:n_probe]]
    probes = spark.createDataFrame(probe_rows, "query_id int, cell int")
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "query_id int, qvec array<double>",
    )
    assigned = ivf_assign(emb, len(cents), seed, dim, vec_col, id_col, centroids=cents)
    cand = assigned.join(F.broadcast(probes), "cell").join(F.broadcast(qdf), "query_id")
    cos = _dot(F.col(vec_col), F.col("qvec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qvec"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.select("query_id", F.col(id_col), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )


def kmeans_codebook(
    emb: DataFrame,
    n_cells: int = 16,
    n_iters: int = 5,
    seed: int = 11,
    sample_fraction: float | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Spherical k-means codebook for IVF: Lloyd's iterations as Spark jobs.

    - init: seeded deterministic sample of n_cells vectors (sortable hash of
      the id column — partitioning-independent), normalized
    - assign: argmax-cosine over broadcast literal centroids (ivf_assign)
    - update: per-cell mean of the normalized members via posexplode ->
      groupBy(cell, pos) avg — a bounded (n_cells x dim)-row aggregate, never
      a collect of vectors — then re-normalize on the driver
    - empty cells keep their previous centroid (deterministic)

    With ``sample_fraction`` the iterations run on a seeded sample (the
    100 TB path: the codebook needs only a representative sample; the full
    assign pass happens once at index-build time).
    """
    work = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if sample_fraction is not None:
        work = work.sample(fraction=sample_fraction, seed=seed)
    work = work.withColumn(
        "_vn",
        F.transform(
            F.col("_v"),
            lambda x: x.cast("double")
            / F.greatest(_norm(F.col("_v")), F.lit(1e-12)),
        ),
    ).select("_id", "_vn").cache()

    # deterministic seeded init: order by a salted hash of the id
    init_rows = (
        work.orderBy(F.xxhash64(F.col("_id"), F.lit(seed)), F.col("_id"))
        .limit(n_cells)
        .collect()
    )
    cents = np.stack([np.asarray(r["_vn"], dtype=np.float64) for r in init_rows])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    for _ in range(n_iters):
        assigned = ivf_assign(
            work, len(cents), seed, cents.shape[1], vec_col="_vn", id_col="_id",
            centroids=cents,
        )
        # deterministic mean: fold member values in sorted-id order (a plain
        # F.sum's float addition order follows partitioning, which would make
        # the codebook depend on how the input happened to be split)
        sums = (
            assigned.select("cell", "_id", F.posexplode("_vn").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("_id").alias("i"), F.col("x").alias("x"))
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["x"],
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        acc = np.zeros_like(cents)
        cnt = np.zeros(len(cents), dtype=np.int64)
        for r in sums:
            acc[r["cell"], r["pos"]] = r["s"]
            cnt[r["cell"]] = r["n"]
        for c in range(len(cents)):
            if cnt[c] > 0:
                v = acc[c] / cnt[c]
                nv = np.linalg.norm(v)
                if nv > 1e-12:
                    new[c] = v / nv
        cents = new
    work.unpersist()
    return cents
