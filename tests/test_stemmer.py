"""S-stemmer (Harman 1991) parity + query-side behavior.

The stemmer ships as four implementations that must agree token-for-token
(the same 4-impl parity contract as the tokenizer/stopword registry,
tests/test_analyzer.py / test_analyzers_locale.py):
Python ``stem_s_one``, JVM Column ``stem_s_col``, the build path's
vocab-level ``Analyzer.stem_vocab``, and the DuckDB oracle's
``STEM_S_SQL_CASE``. The rules are the published ELSE-IF chain — only the
first rule whose full condition (including its exception clause) holds
fires; a blocked rule-2 word like 'goes' (ends -oes) falls through to
rule 3 ('goe').
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from miru_spark import analyzers as anz
from miru_spark.analyzers import STEM_S_SQL_CASE, stem_s_col, stem_s_one

VECTORS = {
    # rule 1: -ies -> -y (unless -eies / -aies)
    "flies": "fly",
    "queries": "query",
    "babies": "baby",
    "ies": "y",
    "eies": "eie",  # rule-1 exception; rule 2 blocked (-ees? no: -eies ends 'ies'...
    # 'eies' ends 'ies' AND 'eies' -> rule 1 blocked; ends 'es' and not
    # aes/ees/oes ('ies') -> rule 2 fires: drop 's' keep 'e' = 'eie'
    "aies": "aie",  # same path through rule 2
    # rule 2: -es -> -e (unless -aes / -ees / -oes)
    "merges": "merge",
    "classes": "classe",
    "indexes": "indexe",
    "es": "e",
    "trees": "tree",  # -ees blocks rule 2; rule 3 drops the s
    "goes": "goe",  # -oes blocks rule 2; rule 3 drops the s
    "does": "doe",  # same fall-through (pinned: exceptions are NOT terminal)
    "aes": "ae",  # -aes blocks rule 2; rule 3 drops the s
    # rule 3: -s -> "" (unless -us / -ss)
    "sorts": "sort",
    "files": "file",  # note: rule 2 fires first (ends -es, not blocked)
    "s": "",
    "bus": "bus",
    "status": "status",
    "miss": "miss",
    "ss": "ss",
    "us": "us",
    "foo_s": "foo_",
    "123s": "123",
    # no rule
    "merge": "merge",
    "sort": "sort",
    "x": "x",
    "sorting": "sorting",
}


def test_python_vectors():
    for w, want in VECTORS.items():
        assert stem_s_one(w) == want, (w, stem_s_one(w), want)


def test_duckdb_parity_vectors():
    words = sorted(VECTORS)
    rows = duckdb.connect().execute(
        "select t, " + STEM_S_SQL_CASE + " from (select unnest(?) as t)", [words]
    ).fetchall()
    for w, got in rows:
        assert got == stem_s_one(w), (w, got)


def test_jvm_parity_vectors(spark):
    words = sorted(VECTORS)
    df = spark.createDataFrame([(w,) for w in words], ["t"])
    rows = df.select(
        "t", F.transform(F.array("t"), lambda c: stem_s_col(c)).getItem(0).alias("s")
    ).collect()
    for r in rows:
        assert r.s == stem_s_one(r.t), (r.t, r.s)


def test_vocab_hook_parity():
    a = anz.find_analyzer("en", True, "s")
    vocab = np.array(sorted(VECTORS), dtype=object)
    out = a.stem_vocab(vocab)
    assert [stem_s_one(w) for w in vocab] == list(out)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abceioustyz0_", min_size=0, max_size=8))
def test_duckdb_parity_hypothesis(w):
    # alphabet biased toward the rule letters (i,e,s,a,o,u) so suffix
    # branches are hit often; DuckDB evaluates the SQL CASE independently
    (got,) = duckdb.connect().execute(
        "select " + STEM_S_SQL_CASE + " from (select ? as t)", [w]
    ).fetchone()
    assert got == stem_s_one(w), (w, got)


def test_analyzer_chain_order_and_empty_drop():
    # stop-filter before stem (Lucene EnglishAnalyzer order); '' stems drop
    a = anz.find_analyzer("en", True, "s")
    assert a.tokenize_one("the flies sorts s about") == ["fly", "sort"]
    # the same text through the JVM path and the DuckDB SQL path
    import pandas as pd

    assert list(a.tokenize_pandas(pd.Series(["the flies sorts s about"]))[0]) == [
        "fly",
        "sort",
    ]
    (db,) = duckdb.connect().execute(
        "select " + a.duckdb_tokens_sql("t") + " from (select 'the flies sorts s about' as t)"
    ).fetchone()
    assert list(db) == ["fly", "sort"]


def test_tokens_col_chain(spark):
    a = anz.find_analyzer("en", True, "s")
    df = spark.createDataFrame([("the flies sorts s about",)], ["content"])
    (row,) = df.select(a.tokens_col("content").alias("toks")).collect()
    assert row.toks == ["fly", "sort"]


def test_parse_query_stems_terms_not_prefixes():
    from miru_spark.query import parser as qp

    a = anz.find_analyzer("en", True, "s")
    ast = qp.parse_query("the merges sorts", analyzer=a)
    assert isinstance(ast, qp.And)
    assert {c.term for c in ast.children} == {"merge", "sort"}
    # Prefix leaves bypass the stemmer (Lucene multi-term query behavior)
    ast = qp.parse_query("merges*", analyzer=a)
    assert isinstance(ast, qp.Prefix) and ast.prefix == "merges"
    # 's' (the only token that stems to empty) is already an EN stopword, so
    # with stopwords on the stopword pruning claims it first
    with pytest.raises(ValueError, match="entirely stopwords"):
        qp.parse_query("s", analyzer=a)
    # a stem-only analyzer reaches the empty-after-stemming branch
    a2 = anz.find_analyzer("en", False, "s")
    with pytest.raises(ValueError, match="empty after stemming"):
        qp.parse_query("s", analyzer=a2)


def test_stemmed_index_three_path_rank_identity(spark, tmp_path):
    """Build with the stemmed analyzer: inflected forms never reach the
    dictionary, and all three query paths (search_local WAND,
    search_distributed, search_batch) answer a stemming query
    rank-identically — the same cross-path contract the stopword tests pin."""
    from miru_spark.corpus import generate_corpus
    from miru_spark.index.build import build_index
    from miru_spark.query.scorer import (
        load_postings,
        search_batch,
        search_distributed,
        search_local,
    )

    corpus = generate_corpus(spark, n_rows=150, seed=7, partitions=2)
    idx = str(tmp_path / "stem")
    build_index(
        spark, corpus, idx, num_partitions=2,
        analyzer=anz.find_analyzer("en", True, "s"),
    )
    # the corpus contains 'merges'/'sorts' as raw text, but every occurrence
    # stemmed at build time — only the stems are in the dictionary
    assert not load_postings(idx, {"merges", "sorts"})
    assert load_postings(idx, {"merge", "sort"})

    q = "the merges sorts"  # stopword pruned, terms stemmed at parse time
    loc = search_local(idx, q, k=10)
    dist = search_distributed(spark, idx, q, k=10).collect()
    batch = sorted(search_batch(spark, idx, [q], k=10).collect(), key=lambda r: r.rank)
    assert [int(d) for d in loc["doc_id"]] == [r.doc_id for r in dist]
    for a, b in zip(loc["score"], [r.score for r in dist]):
        assert abs(a - b) < 1e-9
    # batch path cuts/ranks on the 6-dp-rounded score (same doc set + order)
    assert [int(d) for d in loc["doc_id"]] == [r.doc_id for r in batch]
    for a, b in zip(loc["score"], [r.score for r in batch]):
        assert abs(a - b) < 1e-6
    # and the stemmed query equals querying the stems directly
    direct = search_local(idx, "merge sorts", k=10)
    assert loc["doc_id"].tolist() == direct["doc_id"].tolist()
    assert loc["score"].tolist() == direct["score"].tolist()


def test_config_roundtrip():
    a = anz.find_analyzer("en", True, "s")
    assert a.stem == "s" and a.stopwords
    b = anz.from_config(a.to_config())
    assert b == a
    # absent "stem" key (pre-stemmer analyzer.json files) stays no-stem
    c = anz.from_config({"locale": "en", "use_stopwords": True})
    assert c.stem == "" and c.stopwords
    with pytest.raises(ValueError, match="unknown stemmer"):
        anz.find_analyzer("en", True, "lovins")


def test_direct_construction_validates_stem():
    # find_analyzer is not the only gate: Analyzer() itself must reject an
    # unknown stem kind instead of silently S-stemming and round-tripping
    # the bogus value into analyzer.json (ADVICE r4).
    with pytest.raises(ValueError, match="unknown stemmer"):
        anz.Analyzer("en", True, stem="lovins")
