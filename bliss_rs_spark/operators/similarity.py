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


def embedding_neardup_pairs(
    emb: DataFrame,
    cosine_threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH bucketing.

    Vectors sharing all n_planes signs land in one bucket; the exact cosine
    filter runs only within buckets.  Recall < 1 by construction (LSH); pair
    count and threshold semantics are exact for emitted pairs.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig = F.concat_ws(
        "",
        *[
            F.when(_dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in planes[i]])) >= 0, "1").otherwise("0")
            for i in range(n_planes)
        ],
    )
    b = emb.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "bucket")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            (
                _dot(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}"))
                / (_norm(F.col(f"x.{vec_col}")) * _norm(F.col(f"y.{vec_col}")))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_threshold)
    )
    return pairs


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    seed: int = 11,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its nearest seeded random
    centroid (argmin over a literal centroid set — `least`-chain in JVM).

    At scale the centroid set comes from a sampled k-means; a seeded random
    codebook keeps this deterministic and dependency-free while exercising
    the identical plan shape (argmin over broadcast centroids, partition by
    cell).
    """
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    dists = [
        (_dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in cents[i]]))
         / F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))).alias(f"c{i}")
        for i in range(n_cells)
    ]
    with_d = emb.select(F.col(id_col), F.col(vec_col), *dists)
    best = F.greatest(*[F.col(f"c{i}") for i in range(n_cells)])
    cell = None
    for i in range(n_cells):
        cond = F.col(f"c{i}") == best
        cell = F.when(cond, i) if cell is None else cell.when(cond, i)
    return with_d.select(F.col(id_col), F.col(vec_col), cell.cast("int").alias("cell"))


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
    once per executor via the UDF closure; scoring is one vectorized
    matrix-vector product per Arrow batch.
    """
    w = np.asarray(weights, dtype=np.float64)
    b = float(bias)

    @F.pandas_udf("double")
    def model_score(v: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        z = mat @ w + b
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
) -> DataFrame:
    """IVF-style ANN: score only vectors in the n_probe cells nearest the
    query.  Same top-k contract as cosine_topk, recall < 1 (ANN)."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    q = np.asarray(query_vec, dtype=float)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(cents @ qn))
    probe = [int(c) for c in order[:n_probe]]
    assigned = ivf_assign(emb, n_cells, seed, dim, vec_col, id_col)
    cand = assigned.filter(F.col("cell").isin(probe)).select(id_col, vec_col)
    return cosine_topk(cand, query_vec, k, vec_col, id_col)
