"""Connected components over near-dup pairs: correctness on known graphs,
determinism under repartitioning, and the keep-one integration."""

from pyspark.sql import functions as F

from bliss_rs_spark.operators.dedup import connected_components, near_dedup_keep_one


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_chain_and_separate_clusters(spark):
    # chain 1-2-3-4-5 (diameter 4, needs >1 propagation round) + pair 10-11
    # + triangle 20-21-22
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
    )
    got = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_components_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    p1 = _pairs(spark, edges)
    a = sorted(map(tuple, connected_components(p1).collect()))
    b = sorted(map(tuple, connected_components(p1.repartition(13)).collect()))
    assert a == b


def test_near_dedup_keep_one(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(8)], "doc_id long, content string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = {r["doc_id"] for r in near_dedup_keep_one(docs, pairs).collect()}
    # clusters {1,2,3} -> keep 1; {5,6} -> keep 5; untouched docs survive
    assert kept == {0, 1, 4, 5, 7}


def test_nonconvergence_warns(spark):
    """Round-4 ADVICE fix: a component whose diameter exceeds max_iter must
    WARN about partial labels, not return them silently."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(chain, max_iter=2).collect()


def test_auto_lsh_params_bounded(spark):
    """Round-4 ADVICE fix: bands are capped (plan size is r*b literal
    projections); at moderate thresholds r walks down first so the recall
    target survives at bigger buckets, and b never exceeds max_bands."""
    from bliss_rs_spark.operators.similarity import auto_lsh_params

    for thr in (0.7, 0.8, 0.9, 0.95, 0.99):
        for n in (10_000, 1_000_000, 100_000_000):
            n_planes, b = auto_lsh_params(n, cosine_threshold=thr)
            assert 1 <= b <= 32, (thr, n, b)
            assert n_planes % b == 0
            assert n_planes // b <= 24


def test_embedding_neardup_explicit_n_planes_honored(spark):
    """Round-4 ADVICE fix: an explicit n_planes with bands=None must derive
    bands from it instead of silently discarding the caller's value —
    n_planes=8 at the auto rows/band must not crash the modulo assert and
    must produce the SAME pairs as the fully explicit call."""
    from bliss_rs_spark.operators.similarity import embedding_neardup_pairs

    rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]) for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # planted exact dups
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            emb, 0.99, n_planes=8, seed=3, dim=8
        ).collect()
    }
    exp = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            emb, 0.99, n_planes=8, bands=1, seed=3, dim=8
        ).collect()
    }
    # auto rows/band >= 8 for this tiny corpus -> bands=1 -> identical
    assert got == exp
    assert {(i, 100 + i) for i in range(5)} <= got
