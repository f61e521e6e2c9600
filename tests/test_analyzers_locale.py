"""Locale/stopword analyzer registry (Q2): four-impl parity + fallback walk
+ the index/query contract (TermAnalyzers.java:43-136, EnStopwords.java)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from miru_spark import analyzers as anz
from miru_spark.stopwords_en import EN_STOPWORDS

SW_PIN = [
    # (raw, tokens under the en-stopword analyzer)
    ("The quick brown fox", ["quick", "brown", "fox"]),
    ("a about above merge", ["merge"]),
    ("merge the sort", ["merge", "sort"]),
    ("THE THE THE", []),  # all stopwords → empty list (not an error here)
    ("so merge merge and merge", ["merge", "merge", "merge"]),  # dups kept
    ("don't stop", ["don"]),  # tokenizer splits "don't" → don/t; "t" IS a stopword
]


@pytest.fixture(scope="module")
def en():
    return anz.find_analyzer("en", True)


def test_stopword_list_sane():
    assert len(EN_STOPWORDS) > 500
    for w in ("the", "a", "and", "of", "t"):
        assert w in EN_STOPWORDS


def test_fallback_walk():
    # exact, suffix-strip, standard fallback — all per TermAnalyzers.java:120-136
    assert anz.find_analyzer("en", True).stopwords == EN_STOPWORDS
    assert anz.find_analyzer("en_us", True).stopwords == EN_STOPWORDS  # en_us → en
    assert anz.find_analyzer("en_ie", True).stopwords == EN_STOPWORDS
    # unknown locale → STOPWORD_STANDARD_ANALYZER carries the English set
    assert anz.find_analyzer("zz", True).stopwords == EN_STOPWORDS
    assert anz.find_analyzer(None, True).stopwords == EN_STOPWORDS
    # use_stopwords=False → empty set for every locale
    assert anz.find_analyzer("en", False).stopwords == frozenset()
    assert anz.find_analyzer("zz", False).stopwords == frozenset()


DE_PIN = [
    # (raw, tokens under the German-stopword analyzer)
    ("und der merge", ["merge"]),
    ("merge aber sort", ["merge", "sort"]),
    ("der die das", []),
    ("nicht merge nicht", ["merge"]),  # dups of stopwords all dropped
    ("the merge", ["the", "merge"]),  # 'the' is NOT a German stopword
]


def test_language_stop_sets_registered():
    from miru_spark.stopwords_langs import (
        DE_STOPWORDS,
        ES_STOPWORDS,
        FR_STOPWORDS,
        IT_STOPWORDS,
        NL_STOPWORDS,
        PT_STOPWORDS,
    )

    assert anz.find_analyzer("de", True).stopwords == DE_STOPWORDS
    assert anz.find_analyzer("de_at", True).stopwords == DE_STOPWORDS  # walk
    assert anz.find_analyzer("es", True).stopwords == ES_STOPWORDS
    assert anz.find_analyzer("fr_ca", True).stopwords == FR_STOPWORDS
    assert anz.find_analyzer("it", True).stopwords == IT_STOPWORDS
    assert anz.find_analyzer("pt_br", True).stopwords == PT_STOPWORDS  # walk
    assert anz.find_analyzer("nl", True).stopwords == NL_STOPWORDS
    for w in ("der", "und", "nicht"):
        assert w in DE_STOPWORDS
    for w in ("que", "para", "como"):
        assert w in ES_STOPWORDS
    for w in ("le", "dans", "pour"):
        assert w in FR_STOPWORDS
    for w in ("della", "questo", 'perché'):
        assert w in IT_STOPWORDS
    for w in ("uma", "com", "por"):
        assert w in PT_STOPWORDS
    for w in ("het", "een", "niet"):
        assert w in NL_STOPWORDS
    # disjoint from English where it matters for the de gate query
    assert "der" not in EN_STOPWORDS and "und" not in EN_STOPWORDS


IT_PIN = [
    # (raw, tokens under the Italian-stopword analyzer)
    ("il merge della sort", ["merge", "sort"]),
    ("questo merge anche", ["merge"]),
    ("della questi sulle", []),
    ("the merge", ["the", "merge"]),  # 'the' is NOT an Italian stopword
]


def test_it_pt_nl_four_impl_parity(spark):
    """Same 4-impl parity contract as en/de for the three new sets."""
    import duckdb as _duckdb

    from miru_spark.analyzer import tokenize_arrow_flat

    cases = [
        (anz.find_analyzer("it", True), IT_PIN),
        (
            anz.find_analyzer("pt_br", True),  # walks to pt
            [("uma merge com sort", ["merge", "sort"]), ("por mais como", [])],
        ),
        (
            anz.find_analyzer("nl", True),
            [("het merge een sort", ["merge", "sort"]), ("niet van daar", [])],
        ),
    ]
    for a, pins in cases:
        for raw, expected in pins:
            assert a.tokenize_one(raw) == expected, (a.locale, raw)
        s = pd.Series([r for r, _ in pins])
        assert a.tokenize_pandas(s).tolist() == [e for _, e in pins]
        df = spark.createDataFrame([(r,) for r, _ in pins], "content string")
        got = [r["t"] for r in df.select(a.tokens_col("content").alias("t")).collect()]
        assert got == [e for _, e in pins]
        con = _duckdb.connect()
        con.execute("create table t(content varchar)")
        con.executemany("insert into t values (?)", [(r,) for r, _ in pins])
        got = [
            r[0]
            for r in con.execute(
                f"select {a.duckdb_tokens_sql('content')} from t"
            ).fetchall()
        ]
        assert got == [e for _, e in pins]
        codes, vocab, parents, _ = tokenize_arrow_flat(s)
        keep = ~a.stop_mask_for_vocab(vocab)[codes]
        per_row = [[] for _ in range(len(s))]
        for c, p in zip(codes[keep], parents[keep]):
            per_row[p].append(vocab[c])
        assert per_row == [e for _, e in pins]


def test_de_four_impl_parity(spark):
    """Same 4-impl parity contract as the en set: Python, JVM, DuckDB and
    the Arrow vocab mask must agree token-for-token under the de set."""
    import duckdb as _duckdb

    from miru_spark.analyzer import tokenize_arrow_flat

    de = anz.find_analyzer("de_at", True)
    for raw, expected in DE_PIN:
        assert de.tokenize_one(raw) == expected, raw
    s = pd.Series([r for r, _ in DE_PIN])
    assert de.tokenize_pandas(s).tolist() == [e for _, e in DE_PIN]
    df = spark.createDataFrame([(r,) for r, _ in DE_PIN], "content string")
    got = [r["t"] for r in df.select(de.tokens_col("content").alias("t")).collect()]
    assert got == [e for _, e in DE_PIN]
    con = _duckdb.connect()
    con.execute("create table t(content varchar)")
    con.executemany("insert into t values (?)", [(r,) for r, _ in DE_PIN])
    got = [
        r[0]
        for r in con.execute(f"select {de.duckdb_tokens_sql('content')} from t").fetchall()
    ]
    assert got == [e for _, e in DE_PIN]
    codes, vocab, parents, _ = tokenize_arrow_flat(s)
    keep = ~de.stop_mask_for_vocab(vocab)[codes]
    per_row = [[] for _ in range(len(s))]
    for c, p in zip(codes[keep], parents[keep]):
        per_row[p].append(vocab[c])
    assert per_row == [e for _, e in DE_PIN]


def test_register_custom_locale():
    anz.register_stopwords("xx", ["foo", "bar"])
    try:
        a = anz.find_analyzer("xx_yy", True)
        assert a.stopwords == frozenset({"foo", "bar"})
        assert a.tokenize_one("foo baz bar qux") == ["baz", "qux"]
    finally:
        anz._STOPWORD_SETS.pop("xx", None)


def test_python_impl(en):
    for raw, expected in SW_PIN:
        assert en.tokenize_one(raw) == expected, raw
    s = pd.Series([r for r, _ in SW_PIN])
    assert en.tokenize_pandas(s).tolist() == [e for _, e in SW_PIN]


def test_spark_impl(spark, en):
    df = spark.createDataFrame([(r,) for r, _ in SW_PIN], "content string")
    got = [r["t"] for r in df.select(en.tokens_col("content").alias("t")).collect()]
    assert got == [e for _, e in SW_PIN]


def test_duckdb_impl(en):
    con = duckdb.connect()
    con.execute("create table t(content varchar)")
    con.executemany("insert into t values (?)", [(r,) for r, _ in SW_PIN])
    got = [
        r[0]
        for r in con.execute(f"select {en.duckdb_tokens_sql('content')} from t").fetchall()
    ]
    assert got == [e for _, e in SW_PIN]


def test_arrow_vocab_mask(en):
    from miru_spark.analyzer import tokenize_arrow_flat

    s = pd.Series([r for r, _ in SW_PIN])
    codes, vocab, parents, _ = tokenize_arrow_flat(s)
    keep = ~en.stop_mask_for_vocab(vocab)[codes]
    per_row = [[] for _ in range(len(s))]
    for c, p in zip(codes[keep], parents[keep]):
        per_row[p].append(vocab[c])
    assert per_row == [e for _, e in SW_PIN]


def test_index_and_query_side_agree(spark, tmp_path):
    """Build with analyzer=('en', True): stopwords never reach the
    dictionary, doc_len counts post-stopword tokens, and query-side parsing
    prunes the same words — the end-to-end Q2 contract."""
    from miru_spark.corpus import generate_corpus
    from miru_spark.index.build import build_index
    from miru_spark.query.scorer import load_postings, search_local

    corpus = generate_corpus(spark, n_rows=150, seed=7, partitions=2)
    plain_idx = str(tmp_path / "plain")
    sw_idx = str(tmp_path / "sw")
    build_index(spark, corpus, plain_idx, num_partitions=2)
    build_index(spark, corpus, sw_idx, num_partitions=2, analyzer=("en", True))

    # 'the' exists in the code corpus and the plain dictionary, not in sw's
    assert load_postings(plain_idx, {"the"})
    assert not load_postings(sw_idx, {"the"})

    plain = search_local(plain_idx, "merge AND sort", k=10)
    sw_plainq = search_local(sw_idx, "merge AND sort", k=10)
    sw_stopq = search_local(sw_idx, "the merge AND sort", k=10)
    # query-side pruning: adding a stopword changes nothing on the sw index
    assert sw_plainq["doc_id"].tolist() == sw_stopq["doc_id"].tolist()
    assert sw_plainq["score"].tolist() == sw_stopq["score"].tolist()
    # the same query against the PLAIN index requires the literal 'the'
    assert len(plain) > 0
    # stopword removal changes doc_len → scores genuinely differ
    assert plain["score"].tolist() != sw_plainq["score"].tolist()

    with pytest.raises(ValueError, match="entirely stopwords"):
        search_local(sw_idx, "the a about", k=10)


def test_streaming_append_inherits_analyzer(spark, tmp_path):
    """build_segments reads analyzer.json — a streaming append into a
    stopworded index tokenizes with the index's analyzer, not the default."""
    import os

    from miru_spark.corpus import generate_corpus
    from miru_spark.index.build import build_index, build_segments, key_partition
    from miru_spark.index.merge import merge_segments
    from miru_spark.query.scorer import load_postings

    corpus = generate_corpus(spark, n_rows=80, seed=11, partitions=1)
    idx = str(tmp_path / "sw2")
    build_index(spark, corpus, idx, num_partitions=2, analyzer=("en", True))
    more = generate_corpus(spark, n_rows=40, seed=12, partitions=1)
    # mimic the streaming append path: extra pids through build_segments
    from pyspark.sql import functions as F

    keyed = key_partition(more.drop("sha256"), 1).withColumn(
        "_pid", F.col("_pid") + F.lit(2)
    )
    build_segments(keyed, idx, resume=False).collect()
    merge_segments(spark, idx)
    assert not load_postings(idx, {"the"})  # appended segments also stopworded
