"""Pin the analyzer: all three implementations byte-identical (FIXTURES.md F5)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from miru_spark.analyzer import duckdb_tokens_sql, tokenize_one, tokenize_pandas, tokens_col

PIN = [
    ("Hello, World!", ["hello", "world"]),
    ("def foo(bar): return bar_baz", ["def", "foo", "bar", "return", "bar_baz"]),
    ("dup dup dup", ["dup", "dup", "dup"]),  # duplicates KEPT (TF)
    ("CamelCase HTTPServer", ["camelcase", "httpserver"]),
    ("a__b  c--d", ["a__b", "c", "d"]),
    ("müller naïve", ["m", "ller", "na", "ve"]),  # non-ASCII splits (pinned)
    ("x1 v2 2024 int64", ["x1", "v2", "2024", "int64"]),
    ("", []),
    ("!!!", []),
    ("trailing space ", ["trailing", "space"]),
    ("tab\tand\nnewline", ["tab", "and", "newline"]),
    ("'quoted'", ["quoted"]),
    # Unicode special-casing: İ (U+0130) must simple-map to "i" in EVERY
    # implementation (Python/JVM full-map it to i+U+0307 without the pin)
    ("İstanbul CODE", ["istanbul", "code"]),
]


def test_tokenize_one():
    for raw, expected in PIN:
        assert tokenize_one(raw) == expected, raw


def test_tokenize_pandas_matches():
    s = pd.Series([raw for raw, _ in PIN])
    out = tokenize_pandas(s).tolist()
    assert out == [e for _, e in PIN]


def test_spark_tokens_match(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in PIN], "content string")
    got = [r["t"] for r in df.select(tokens_col("content").alias("t")).collect()]
    assert got == [e for _, e in PIN]


def test_duckdb_tokens_match():
    con = duckdb.connect()
    con.execute("create table t(content varchar)")
    con.executemany("insert into t values (?)", [(raw,) for raw, _ in PIN])
    got = [r[0] for r in con.execute(f"select {duckdb_tokens_sql('content')} from t").fetchall()]
    assert got == [e for _, e in PIN]


def test_arrow_flat_matches_pandas():
    """The Arrow build-path tokenizer must agree with the pandas reference
    implementation token-for-token (Q2 analyzer-parity risk)."""
    import numpy as np
    import pandas as pd

    from miru_spark.analyzer import tokenize_arrow_flat, tokenize_pandas

    s = pd.Series([
        "Def MERGE, sort(x1) def", "", "  ", "müller naïve HTTPServer",
        "a_b-c.d 2024int64", None, "ümlaut ÜMLAUT", "日本語 text",
        "İstanbul ǅungla ﬁle STRASSE ß ΣΙΓΜΑ",  # unicode special-casing parity
    ])
    codes, vocab, parents, n = tokenize_arrow_flat(s)
    got = [(int(p), str(vocab[c])) for p, c in zip(parents, codes)]
    exp = [(i, t) for i, toks in enumerate(tokenize_pandas(s)) for t in toks]
    assert got == exp
    assert n == len(exp)
    assert np.all(np.diff(parents) >= 0)
