"""Code-aware tokenizer — the engine's "feature extractor".

Reference parity: bliss-rs turns one decoded file into a fixed-length
analysis vector via per-window descriptor pipelines
(/root/reference/src/song/mod.rs:413-508); decoder-agnosticism guarantees any
source format yields the same canonical analysis
(/root/reference/src/song/decoder.rs:115-129, README.md:144-147).  Our
analogue turns one source file into a bag of (term, tf) statistics through a
single, versioned tokenizer SPEC that is source-language-agnostic, plus a
``dl`` (document length) scalar — and, like the reference's adler32 checksum
recipe (src/song/decoder.rs:119-128), a ``content_sha256`` row invariant
computed with the built-in ``F.sha2``.

TOKENIZER SPEC v1 (any change bumps IndexConfig.analyzer_version):
  1. split CamelCase runs:  "HTMLParser" -> "HTML Parser"   (rule A)
  2. split lower->Upper:    "parseHTML"  -> "parse HTML"    (rule B)
     (rule A is applied before rule B; both are global)
  3. lowercase
  4. split on runs of [^a-z0-9]  (snake_case splits for free: '_' is a
     separator)
  5. drop empty tokens
  6. optional lang tagging: term -> "<lang>:<term>" (IndexConfig.lang_tagging)

The spec is deliberately mirrorable in ANSI SQL (see ``tokenize_sql_duckdb``)
so the DuckDB oracle can replay it exactly; the production path is a
vectorized pandas UDF (Arrow batches, no per-row Python at the Spark level).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Rule A then rule B, then lowercase, then split.
_RULE_A = re.compile(r"([A-Z]+)([A-Z][a-z])")
_RULE_B = re.compile(r"([a-z0-9])([A-Z])")
_SPLIT = re.compile(r"[^a-z0-9]+")

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField(
            "tokens",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType(), False),
                        T.StructField("tf", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def tokenize_text(text: str) -> list[str]:
    """Pure-Python token stream for one document (order-preserving).

    This single function IS the spec; the pandas UDF, the pytest oracle and
    the golden fixtures all call it, so there is exactly one implementation
    to disagree with the SQL mirror (and a test pins them together).
    """
    if not text:
        return []
    s = _RULE_A.sub(r"\1 \2", text)
    s = _RULE_B.sub(r"\1 \2", s)
    return [t for t in _SPLIT.split(s.lower()) if t]


def term_counts(text: str, lang: str | None = None, lang_tagging: bool = False) -> dict[str, int]:
    toks = tokenize_text(text)
    if lang_tagging and lang:
        prefix = lang.lower() + ":"
        toks = [prefix + t for t in toks]
    return dict(Counter(toks))


def make_tokenize_udf(lang_tagging: bool = False):
    """Vectorized tokenizer: (content, lang) -> struct<tokens array<struct<term,tf>>, dl int>.

    tokens are sorted by term for deterministic output (resumability: the
    same input batch always produces byte-identical rows, cf. the reference's
    decoder-agnostic canonical-form invariant).
    """

    @F.pandas_udf(TOKENS_SCHEMA)
    def tokenize(content: pd.Series, lang: pd.Series) -> pd.DataFrame:
        out_tokens = []
        out_dl = []
        for text, lg in zip(content, lang):
            counts = term_counts(
                text if isinstance(text, str) else "",
                lg if isinstance(lg, str) else None,
                lang_tagging,
            )
            items = sorted(counts.items())
            out_tokens.append([{"term": t, "tf": int(c)} for t, c in items])
            out_dl.append(int(sum(counts.values())))
        return pd.DataFrame({"tokens": out_tokens, "dl": out_dl})

    return tokenize


def with_tokens(df, content_col: str = "content", lang_col: str = "lang", lang_tagging: bool = False):
    """Append ``tokens`` (array<struct<term,tf>>) and ``dl`` columns."""
    udf = make_tokenize_udf(lang_tagging)
    tk = udf(F.col(content_col), F.col(lang_col))
    return df.withColumn("_tk", tk).withColumn("tokens", F.col("_tk.tokens")).withColumn(
        "dl", F.col("_tk.dl")
    ).drop("_tk")


# --- SQL mirrors of the spec -------------------------------------------------

def tokenize_sql_duckdb(col: str) -> str:
    """DuckDB expression producing the token *array* for a text column.

    Mirrors TOKENIZER SPEC v1 exactly (tested in tests/test_tokenizer.py).
    DuckDB backrefs are \\1-style and need the 'g' flag for global replace.
    """
    return (
        "list_filter(string_split_regex(lower("
        f"regexp_replace(regexp_replace({col}, '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),"
        " '([a-z0-9])([A-Z])', '\\1 \\2', 'g')), '[^a-z0-9]+'), x -> x <> '')"
    )


def tokenize_sql_spark(col: str) -> str:
    """Spark-SQL expression producing the token array (backrefs are $1-style,
    global by default).  Used only for cross-checking the UDF against Spark's
    JVM regex engine — the production path is the pandas UDF."""
    return (
        "filter(split(lower("
        f"regexp_replace(regexp_replace({col}, '([A-Z]+)([A-Z][a-z])', '$1 $2'),"
        " '([a-z0-9])([A-Z])', '$1 $2')), '[^a-z0-9]+'), x -> x <> '')"
    )
