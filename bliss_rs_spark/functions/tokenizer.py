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

# Parallel primitive arrays (terms[i] occurs tfs[i] times), NOT an
# array<struct>: Arrow converts list<string>/list<int> columns from pandas
# ~10x faster than list<struct> built from Python dicts, and the pair zips
# back together JVM-side via arrays_zip at explode time.
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType()), True),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), True),
        T.StructField("dl", T.IntegerType(), True),
        # per-row failure capture: skip-and-record, never abort the job
        # (ref: store_failed_song, /root/reference/src/library.rs:1639-1668;
        #  null content is recorded like the reference's `error text` column)
        T.StructField("error", T.StringType(), True),
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
    """Vectorized tokenizer: (content, lang) -> struct<terms array<string>,
    tfs array<int>, dl int, error string>.

    terms are sorted for deterministic output (resumability: the
    same input batch always produces byte-identical rows, cf. the reference's
    decoder-agnostic canonical-form invariant).
    """

    @F.pandas_udf(TOKENS_SCHEMA)
    def tokenize(content: pd.Series, lang: pd.Series) -> pd.DataFrame:
        out_terms = []
        out_tfs = []
        out_dl = []
        out_err = []
        for text, lg in zip(content, lang):
            if text is None:
                out_terms.append(None)
                out_tfs.append(None)
                out_dl.append(None)
                out_err.append("null content")
                continue
            try:
                counts = term_counts(
                    str(text), lg if isinstance(lg, str) else None, lang_tagging
                )
                items = sorted(counts.items())
                out_terms.append([t for t, _ in items])
                out_tfs.append([int(c) for _, c in items])
                out_dl.append(int(sum(counts.values())))
                out_err.append(None)
            except Exception as e:  # skip-and-record, never abort
                out_terms.append(None)
                out_tfs.append(None)
                out_dl.append(None)
                out_err.append(f"{type(e).__name__}: {e}")
        return pd.DataFrame(
            {"terms": out_terms, "tfs": out_tfs, "dl": out_dl, "error": out_err}
        )

    return tokenize


def with_tokens(df, content_col: str = "content", lang_col: str = "lang", lang_tagging: bool = False):
    """Append ``terms``/``tfs`` parallel arrays, ``dl`` and ``error`` columns."""
    udf = make_tokenize_udf(lang_tagging)
    tk = udf(F.col(content_col), F.col(lang_col))
    return (
        df.withColumn("_tk", tk)
        .withColumn("terms", F.col("_tk.terms"))
        .withColumn("tfs", F.col("_tk.tfs"))
        .withColumn("dl", F.col("_tk.dl"))
        .withColumn("error", F.col("_tk.error"))
        .drop("_tk")
    )


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
