"""Local replay of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.  This is the engine's equivalent of the
reference's cross-implementation consistency tests
(/root/reference/src/song/mod.rs:636-689)."""

import math

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    if v == 0:
                        v = 0.0  # -0.0 == 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def _registry():
    from bliss_rs_spark.plans.driver_queries import registry

    return registry()


NAMES = sorted(_registry().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    fn, sql = _registry()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    if sql is None:
        # rows-only check, like the driver's weaker path
        assert isinstance(spark_rows, list)
        return

    con = _duck()
    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    s = _canon(spark_rows, spark_cols)
    d = _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
    qs, osql = m.queries(), m.oracle_sql()
    assert set(osql).issubset(set(qs))
    assert len(qs) >= 20
