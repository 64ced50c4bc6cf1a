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
