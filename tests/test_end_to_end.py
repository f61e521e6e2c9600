"""End-to-end: build index on the deterministic corpus, run the reference
query set (FIXTURES.md F2), assert rank-identical top-k vs the brute-force
oracle on BOTH execution paths (local serving + distributed DataFrame)."""

import numpy as np
import pytest

from miru_spark.corpus import reference_query_set
from miru_spark.index.build import assign_doc_ids
from miru_spark.query.oracle import oracle_topk
from miru_spark.query.scorer import search_distributed, search_local


def _assert_rank_identical(got, expected, qid):
    g = [(int(d), round(float(s), 6)) for d, s in zip(got["doc_id"], got["score"])]
    e = [(int(d), round(float(s), 6)) for d, s in zip(expected["doc_id"], expected["score"])]
    assert [x[0] for x in g] == [x[0] for x in e], f"qid={qid}: docIDs differ\n{g}\n{e}"
    for (gd, gs), (ed, es) in zip(g, e):
        assert abs(gs - es) <= 1e-6 * max(1.0, abs(es)), f"qid={qid} doc={gd}: {gs} vs {es}"


@pytest.fixture(scope="module")
def corpus_with_ids(spark, tiny_corpus):
    df, _ = assign_doc_ids(tiny_corpus, 4)
    df = df.persist()
    df.count()
    return df


def test_build_summary(tiny_index, spark):
    import json, os

    with open(os.path.join(tiny_index, "build_summary.json")) as f:
        s = json.load(f)
    assert s["n_docs"] == 200
    assert s["partitions"] == 4
    assert s["n_terms"] > 30


def test_docids_are_stable_across_parallelism(spark, tiny_corpus):
    """north rule: docIDs derive from (repo,path,commit) rank — identical at
    any partitioning (SURVEY.md §7.4b)."""
    a, _ = assign_doc_ids(tiny_corpus, 2)
    b, _ = assign_doc_ids(tiny_corpus, 8)
    pa_ = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in a.collect()}
    pb = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in b.collect()}
    assert pa_ == pb


@pytest.mark.parametrize("q", reference_query_set(), ids=lambda q: f"qid{q['qid']}")
def test_local_matches_oracle(q, tiny_index, corpus_with_ids):
    got = search_local(tiny_index, q["query"], k=q["k"], lang_filter=q["lang_filter"], repo_filter=q["repo_filter"])
    exp = oracle_topk(corpus_with_ids, q["query"], k=q["k"], lang_filter=q["lang_filter"], repo_filter=q["repo_filter"]).toPandas()
    _assert_rank_identical(got, exp, q["qid"])


@pytest.mark.parametrize(
    "q",
    [x for x in reference_query_set() if x["qid"] in (1, 3, 5, 6, 7, 8, 12)],
    ids=lambda q: f"qid{q['qid']}",
)
def test_distributed_matches_oracle(q, tiny_index, corpus_with_ids, spark):
    got = search_distributed(
        spark, tiny_index, q["query"], k=q["k"], lang_filter=q["lang_filter"], repo_filter=q["repo_filter"]
    ).toPandas()
    exp = oracle_topk(corpus_with_ids, q["query"], k=q["k"], lang_filter=q["lang_filter"], repo_filter=q["repo_filter"]).toPandas()
    _assert_rank_identical(got, exp, q["qid"])


def test_zero_hit_query(tiny_index):
    out = search_local(tiny_index, "zebra AND merge")
    assert len(out) == 0


def test_blockmax_wand_prunes_and_is_rank_identical(tiny_index, corpus_with_ids):
    """The block-max step must (a) keep top-k rank-identical to brute force,
    (b) actually skip candidates via per-block max-score bounds."""
    q = "def OR merge OR rareterm0"
    diag: dict = {}
    got = search_local(tiny_index, q, k=5, diag=diag)
    exp = oracle_topk(corpus_with_ids, q, k=5).toPandas()
    _assert_rank_identical(got, exp, "wand")
    assert diag["theta"] > 0.0
    # at 200 docs each term is ~1 block, so bounds may not prune here; the
    # strict pruning guarantee is pinned in tests/test_wand.py on postings
    # crafted with many blocks
    assert diag["scored"] == diag["after_blockmax"] <= diag["union_size"]


def test_blockmax_wand_matches_oracle_many_disjunctions(tiny_index, corpus_with_ids):
    for q in ("merge OR sort OR hash OR join", "the OR license OR import OR x1",
              "value OR data OR index OR query OR scan"):
        got = search_local(tiny_index, q, k=10, diag={})
        exp = oracle_topk(corpus_with_ids, q, k=10).toPandas()
        _assert_rank_identical(got, exp, q)


def test_field_filter_clauses_match_filter_args(tiny_index, spark):
    """`lang:python` / `repo:x` clauses in the query string must behave
    exactly like the explicit filter arguments (both resolve to the roaring
    filter bitmaps)."""
    for q, kw in [
        ("merge AND sort AND lang:python", dict(lang_filter=["python"])),
        ("def AND repo:org1/repo1", dict(repo_filter=["org1/repo1"])),
        ("merge AND sort AND lang:python AND lang:go", dict()),  # two langs AND → empty
    ]:
        a = search_local(tiny_index, q, k=10)
        base_q = " AND ".join(w for w in q.split(" AND ") if ":" not in w)
        b = search_local(tiny_index, base_q, k=10, **kw) if kw else None
        if b is not None:
            assert a["doc_id"].tolist() == b["doc_id"].tolist()
            assert a["score"].tolist() == b["score"].tolist()
        else:
            assert len(a) == 0  # conjunctive lang:python AND lang:go is empty

    # distributed path agrees
    d = search_distributed(spark, tiny_index, "merge AND sort AND lang:python", k=10).toPandas()
    l = search_local(tiny_index, "merge AND sort AND lang:python", k=10)
    assert d["doc_id"].tolist() == l["doc_id"].tolist()


def test_unknown_field_rejected(tiny_index):
    import pytest as _pytest

    from miru_spark.query import parser as qp

    with _pytest.raises(ValueError):
        qp.parse_query("merge AND author:bob")


def test_xor_matches_oracle_both_paths(tiny_index, corpus_with_ids, spark):
    """Xor node (MiruFilterOperation.java:16): odd-membership docs, scored by
    their matched terms — rank-identical on both paths vs the oracle."""
    for q in ("merge XOR sort", "merge XOR sort XOR def"):
        got_l = search_local(tiny_index, q, k=10)
        exp = oracle_topk(corpus_with_ids, q, k=10).toPandas()
        _assert_rank_identical(got_l, exp, q)
        got_d = search_distributed(spark, tiny_index, q, k=10).toPandas()
        _assert_rank_identical(got_d, exp, q)


def test_tfidf_twin_survives_absent_query_term(spark, tmp_path):
    """Regression: ANSI mode makes tf/0 THROW, so ft_tfidf_miru must skip
    query terms with collection frequency 0 (a corpus simply missing one of
    the fixed terms) instead of dividing by their zero CF."""
    from miru_spark.operators.fulltext import QUERY_TERMS_OR, ft_tfidf_miru

    sf = str(tmp_path)
    rows = [
        (i, "python", f"doc {i} holds {QUERY_TERMS_OR[0]} tokens only", 30)
        for i in range(4)
    ] + [(4, "python", "nothing relevant here", 21)]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    got = ft_tfidf_miru(spark, sf).toPandas()
    # terms 1..k never occur: score = tf_0/cf_0, only docs 0-3 match
    assert got["doc_id"].tolist() == [3, 2, 1, 0]
    assert all(abs(s - 0.25) < 1e-9 for s in got["score"])

    # corpus missing EVERY query term → empty result, not an exception
    spark.createDataFrame(
        [(0, "python", "no match at all", 15)],
        "doc_id long, lang string, text string, n_chars long",
    ).write.parquet(f"{tmp_path}/empty/documents.parquet")
    assert ft_tfidf_miru(spark, f"{tmp_path}/empty").count() == 0
