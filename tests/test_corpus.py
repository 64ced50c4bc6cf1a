"""Corpus determinism + invariant tests (reference: decoder-agnostic canonical
form + adler32 recipe, /root/reference/src/song/decoder.rs:115-129)."""

from pyspark.sql import functions as F

from bliss_rs_spark.corpus import documents_from_testdata, synth_documents, with_invariants

SF_DIR = "/root/testdata/sf0.001"


def test_synth_deterministic_across_partitionings(spark):
    a = synth_documents(spark, 300, seed=42, n_partitions=1).orderBy("path").collect()
    b = synth_documents(spark, 300, seed=42, n_partitions=7).orderBy("path").collect()
    assert a == b
    c = synth_documents(spark, 300, seed=43, n_partitions=1).orderBy("path").collect()
    assert a != c


def test_synth_shape_and_invariants(spark):
    df = with_invariants(synth_documents(spark, 200, seed=42))
    assert set(df.columns) == {"repo", "path", "commit", "lang", "content", "doc_id", "content_sha256"}
    rows = df.collect()
    assert len(rows) == 200
    assert len({r["doc_id"] for r in rows}) == 200  # unique primary key
    # sha256 invariant: recompute one row in Python
    import hashlib
    r = rows[0]
    assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_planted_duplicates(spark):
    df = with_invariants(synth_documents(spark, 300, seed=42))
    dup_groups = (
        df.groupBy("content_sha256").count().filter(F.col("count") > 1).count()
    )
    assert dup_groups >= 2  # every 97th doc clones an earlier one


def test_repo_blob_roundtrip(spark):
    """Container explode (S4): pack files into repo blobs, explode back,
    recover every (repo, commit, path, content) exactly."""
    from bliss_rs_spark.corpus import explode_repo_blobs, pack_repo_blobs

    docs = synth_documents(spark, 120, seed=42)
    blobs = pack_repo_blobs(docs)
    assert blobs.count() < 120  # actually packs many files per container
    back = explode_repo_blobs(blobs)
    a = sorted((r["repo"], r["commit"], r["path"], r["content"]) for r in docs.collect())
    b = sorted((r["repo"], r["commit"], r["path"], r["content"]) for r in back.collect())
    assert a == b
    prov = back.select("provenance.*").collect()
    assert all(p["container_kind"] == "repo_blob" for p in prov)
    assert all(1 <= p["ordinal"] <= p["container_files"] for p in prov)


def test_testdata_adapter(spark):
    df = documents_from_testdata(spark, SF_DIR)
    assert df.count() == 500
    assert {"repo", "path", "commit", "lang", "content", "doc_id", "content_sha256"} <= set(df.columns)
    assert df.select("doc_id").distinct().count() == 500
