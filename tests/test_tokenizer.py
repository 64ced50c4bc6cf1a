"""Tokenizer golden tests — the per-operator boundary tests of the reference
(zcr/flatness/tempo bounds, /root/reference/src/timbral.rs:271-328), plus the
SQL-mirror consistency check (the "two decoders, one contract" pattern,
/root/reference/src/song/mod.rs:636-689)."""

import duckdb
import pytest

from bliss_rs_spark.functions.tokenizer import (
    term_counts,
    tokenize_sql_duckdb,
    tokenize_sql_spark,
    tokenize_text,
    with_tokens,
)

# Golden fixtures: known input => exact expected token stream (FIXTURES.md §4).
GOLDEN = [
    ("camel_basic", "parseHtmlDocument", ["parse", "html", "document"]),
    ("camel_acronym", "HTMLParser readsXMLFast", ["html", "parser", "reads", "xml", "fast"]),
    ("snake_basic", "posting_block_codec", ["posting", "block", "codec"]),
    ("mixed", "let fooBar_baz = 42;", ["let", "foo", "bar", "baz", "42"]),
    ("digits", "base64Encode sha256sum", ["base64", "encode", "sha256sum"]),
    ("empty_file", "", []),
    ("punct_only", "!@# $%^ &*()", []),
    ("unicode_sep", "héllo wörld", ["h", "llo", "w", "rld"]),
    ("rust_keywords", "fn main() { return impl_trait; }", ["fn", "main", "return", "impl", "trait"]),
    ("huge_identifier", "a" * 500, ["a" * 500]),
    ("newlines", "def f():\n\treturn 1\n", ["def", "f", "return", "1"]),
]


@pytest.mark.parametrize("case_id,content,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_tokens(case_id, content, expected):
    assert tokenize_text(content) == expected


def test_term_counts_tf():
    tc = term_counts("fn fn FN fnFn", None)
    # "fn fn FN fnFn" -> fn fn fn fn fn  (FN lowers to fn; fnFn splits)
    assert tc == {"fn": 5}


def test_lang_tagging():
    tc = term_counts("return x", "Rust", lang_tagging=True)
    assert tc == {"rust:return": 1, "rust:x": 1}


def test_duckdb_mirror_matches_python():
    """The DuckDB oracle expression must reproduce the spec exactly."""
    con = duckdb.connect()
    texts = [g[1] for g in GOLDEN] + ["XMLHttpRequest", "snake_case camelCase MixedUP99ok"]
    for text in texts:
        got = con.execute(
            f"select {tokenize_sql_duckdb('?::varchar')}"
            , [text]).fetchone()[0]
        assert list(got) == tokenize_text(text), text


def test_duckdb_mirror_property(spark):
    """Property test: the DuckDB mirror equals the Python spec on arbitrary
    printable-ASCII strings (the oracle corpus alphabet)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120))
    def prop(text):
        got = con.execute(f"select {tokenize_sql_duckdb('?::varchar')}", [text]).fetchone()[0]
        assert list(got) == tokenize_text(text), repr(text)

    prop()


def test_spark_sql_mirror_property(spark):
    """Property-style: the Spark-SQL regex mirror equals the Python spec on a
    deterministic batch of pseudo-random printable-ASCII strings (one job)."""
    import random

    rng = random.Random(7)
    alphabet = [chr(c) for c in range(32, 127)]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, content string")
    got = {
        r["id"]: list(r["toks"])
        for r in df.selectExpr("id", tokenize_sql_spark("content") + " as toks").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize_text(t), repr(t)


def test_spark_sql_mirror_and_udf(spark):
    """Spark-SQL regex mirror and the pandas UDF both match the spec."""
    rows = [(i, g[1], "rust") for i, g in enumerate(GOLDEN)]
    df = spark.createDataFrame(rows, "id int, content string, lang string")
    got_sql = {
        r["id"]: list(r["toks"])
        for r in df.selectExpr("id", tokenize_sql_spark("content") + " as toks").collect()
    }
    for i, (_, content, expected) in enumerate(GOLDEN):
        assert got_sql[i] == expected, content

    got_udf = {r["id"]: (sorted(zip(r["terms"], r["tfs"])), r["dl"])
               for r in with_tokens(df).collect()}
    for i, (_, content, expected) in enumerate(GOLDEN):
        counts = term_counts(content)
        assert got_udf[i][0] == sorted(counts.items())
        assert got_udf[i][1] == sum(counts.values())
