"""F5 removal/REPAIR path + S4 doc-time index.

Semantics under test (miru parity):
- REMOVE is version-guarded (MiruIndexer.java:138-162): an older version
  never overrides a newer one, replay is idempotent.
- The removal bitmap is a candidate mask only (buildIndexMask,
  MiruBitmapsRoaring.java:457-505): surviving docs keep their exact
  pre-delete BM25 scores (df/avgdl/N untouched).
- Both query paths and the WAND-pruned disjunctive path stay
  rank-identical to "brute-force top-k minus removed ids".
- Streaming REMOVE/REPAIR ops journal through pending_ops and apply at
  refresh(); a replayed op batch is a no-op.
- time_range=(lo,hi) masks candidates by the doc-time column in both
  paths (FullTextCustomQuestion.java:109-111 composition).
"""

import os

import pytest
from pyspark.sql import functions as F

from miru_spark.corpus import generate_corpus
from miru_spark.index import removal
from miru_spark.index.build import assign_doc_ids, build_index
from miru_spark.query.oracle import oracle_topk
from miru_spark.query.scorer import search_distributed, search_local


@pytest.fixture(scope="module")
def del_index(spark, tiny_corpus, tmp_path_factory):
    """Fresh index (the session tiny_index must stay unmutated) with a ts
    column: ts = row index % 37, recoverable from the generator's path."""
    index_dir = str(tmp_path_factory.mktemp("delidx") / "idx")
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")
    corpus = tiny_corpus.withColumn("ts", F.pmod(rowidx, F.lit(37)))
    build_index(spark, corpus, index_dir, num_partitions=4)
    with_ids, _ = assign_doc_ids(corpus.drop("ts"), 4)
    return index_dir, with_ids.persist()


def _expected(with_ids, query, removed_ids, k=10):
    """Mask-only semantics: brute-force top-k over the FULL corpus (global
    stats), removed ids dropped, then cut to k."""
    exp = oracle_topk(with_ids, query, k=10_000).toPandas()
    exp = exp[~exp["doc_id"].isin(removed_ids)].head(k)
    return list(exp["doc_id"]), [round(float(s), 6) for s in exp["score"]]


def test_remove_masks_both_paths(del_index, spark):
    index_dir, with_ids = del_index
    base = search_local(index_dir, "merge AND sort", k=5)
    victims = [int(base["doc_id"].iloc[0]), int(base["doc_id"].iloc[2])]
    assert removal.remove_docs(index_dir, victims, version=1) == 2

    exp_ids, exp_scores = _expected(with_ids, "merge AND sort", victims, k=5)
    got_l = search_local(index_dir, "merge AND sort", k=5)
    assert list(got_l["doc_id"]) == exp_ids
    assert [round(float(s), 6) for s in got_l["score"]] == exp_scores
    got_d = search_distributed(spark, index_dir, "merge AND sort", k=5).toPandas()
    assert list(got_d["doc_id"]) == exp_ids


def test_wand_path_sound_under_removal(del_index, spark):
    """Disjunctive query takes the block-max WAND path; θ must be seeded
    from ELIGIBLE docs only, so the top-k after heavy deletion is still
    exactly brute-force-minus-removed."""
    index_dir, with_ids = del_index
    top = search_local(index_dir, "merge OR sort OR def", k=20)
    victims = [int(d) for d in top["doc_id"].iloc[:15]]
    removal.remove_docs(index_dir, victims, version=2)
    removal.remove_docs(index_dir, [0, 1], version=2)
    try:
        all_removed = set(removal.removed_array(index_dir).tolist())
        exp_ids, exp_scores = _expected(with_ids, "merge OR sort OR def", all_removed, k=10)
        got = search_local(index_dir, "merge OR sort OR def", k=10)
        assert list(got["doc_id"]) == exp_ids
        assert [round(float(s), 6) for s in got["score"]] == exp_scores
    finally:  # restore for later tests in this module
        removal.repair_docs(index_dir, victims + [0, 1], version=3)


def test_version_guard(del_index):
    index_dir, _ = del_index
    # doc 42: removed at v10
    assert removal.remove_docs(index_dir, [42], version=10) == 1
    # older remove: no-op (already recorded at higher version)
    assert removal.remove_docs(index_dir, [42], version=5) == 0
    # same-version replay: no-op (idempotent WAL delivery)
    assert removal.remove_docs(index_dir, [42], version=10) == 0
    # older repair: rejected, doc stays removed
    assert removal.repair_docs(index_dir, [42], version=9) == 0
    assert 42 in removal.removed_array(index_dir)
    # newer repair: restores
    assert removal.repair_docs(index_dir, [42], version=11) == 1
    assert 42 not in removal.removed_array(index_dir)
    # stale remove after repair: rejected even though the bit is clear
    assert removal.remove_docs(index_dir, [42], version=11) == 0
    assert 42 not in removal.removed_array(index_dir)


def test_time_range_masks_both_paths(del_index, spark):
    """ts = rowidx % 37; range [0, 17] keeps ~half the docs. Expected =
    brute-force minus out-of-range ids (global stats, mask-only)."""
    index_dir, with_ids = del_index
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")
    out_of_range = {
        r["doc_id"]
        for r in with_ids.withColumn("ts", F.pmod(rowidx, F.lit(37)))
        .filter(~F.col("ts").between(0, 17))
        .select("doc_id")
        .collect()
    }
    removed_now = set(removal.removed_array(index_dir).tolist())
    exp_ids, exp_scores = _expected(
        with_ids, "merge OR sort", out_of_range | removed_now, k=8
    )
    got_l = search_local(index_dir, "merge OR sort", k=8, time_range=(0, 17))
    assert list(got_l["doc_id"]) == exp_ids
    assert [round(float(s), 6) for s in got_l["score"]] == exp_scores
    got_d = search_distributed(
        spark, index_dir, "merge OR sort", k=8, time_range=(0, 17)
    ).toPandas()
    assert list(got_d["doc_id"]) == exp_ids


def test_streaming_remove_repair_and_replay(spark, tmp_path):
    """REMOVE op batch → refresh → doc invisible; replayed op batch no-op;
    REPAIR under newer version restores."""
    from miru_spark.streaming.ingest import append_batch, refresh

    index_dir = str(tmp_path / "sidx")
    os.makedirs(index_dir)
    corpus = generate_corpus(spark, n_rows=80, seed=7, partitions=1)
    append_batch(corpus.withColumn("op", F.lit("add")), 0, index_dir, 2)
    refresh(spark, index_dir)
    before = search_local(index_dir, "merge OR sort", k=5)
    victim = before.iloc[0]
    ops = spark.createDataFrame(
        [("remove", victim["repo"], victim["path"], victim["commit"])],
        "op string, repo string, path string, commit string",
    )
    # pad op rows to the corpus schema (adds need content; ops don't)
    ops_full = ops.select(
        "op", "repo", "path", "commit",
        F.lit("x").alias("lang"), F.lit("").alias("content"),
        F.sha2(F.lit(""), 256).alias("sha256"),
    )
    append_batch(ops_full, 1, index_dir, 2)
    s = refresh(spark, index_dir)
    assert s["n_removed"] == 1
    after = search_local(index_dir, "merge OR sort", k=5)
    assert victim["doc_id"] not in set(after["doc_id"])

    # replay the same op batch — done-marker short-circuits, nothing changes
    append_batch(ops_full, 1, index_dir, 2)
    s2 = refresh(spark, index_dir)
    assert s2["n_removed"] == 1

    # REPAIR at a newer version restores visibility
    repair_full = ops_full.withColumn("op", F.lit("repair"))
    append_batch(repair_full, 2, index_dir, 2)
    s3 = refresh(spark, index_dir)
    assert s3["n_removed"] == 0
    restored = search_local(index_dir, "merge OR sort", k=5)
    assert victim["doc_id"] in set(restored["doc_id"])


def test_reserved_pids_survive_crash_window(spark, tmp_path):
    """ADVICE fix: the pid reservation is durable before any build, so a
    'crashed' batch (reservation present, not done) keeps its pids claimed
    and a replay completes under the SAME pids — no duplicate docs."""
    import json

    from miru_spark.streaming.ingest import _bases, append_batch, refresh

    index_dir = str(tmp_path / "cidx")
    os.makedirs(index_dir)
    corpus = generate_corpus(spark, n_rows=60, seed=9, partitions=1)
    append_batch(corpus, 0, index_dir, 2)
    # simulate the crash window: mark batch 1 reserved but not done
    bpath = os.path.join(index_dir, "stream_batches.json")
    with open(bpath) as f:
        batches = json.load(f)
    batches["1"] = {"pid_base": _bases(index_dir), "n_partitions": 2, "done": False}
    with open(bpath, "w") as f:
        json.dump(batches, f)
    claimed_base = batches["1"]["pid_base"]
    # a NEW batch must not collide with the crashed batch's reserved pids
    assert _bases(index_dir) == claimed_base + 2
    # the replay of batch 1 reuses its reservation
    wave2 = generate_corpus(spark, n_rows=90, seed=9, partitions=1).filter(
        F.regexp_extract("path", r"f(\d+)\.", 1).cast("long") >= 60
    )
    append_batch(wave2, 1, index_dir, 2)
    with open(bpath) as f:
        rec = json.load(f)["1"]
    assert rec["done"] and rec["pid_base"] == claimed_base
    assert min(rec["pids"]) == claimed_base
    refresh(spark, index_dir)
    import json as _j

    with open(os.path.join(index_dir, "corpus_stats.json")) as f:
        assert _j.load(f)["n_docs"] == 90


def test_ts_range_clause_in_query(del_index, spark):
    """`ts:[lo TO hi]` as a first-class query clause (Range node) — composes
    with terms/booleans, rank-identical to the oracle on both paths."""
    index_dir, with_ids = del_index
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")
    corpus_ts = with_ids.withColumn("ts", F.pmod(rowidx, F.lit(37)))
    removed_now = set(removal.removed_array(index_dir).tolist())
    for q in ("merge ts:[0 TO 17]", "(merge OR sort) AND ts:[5 TO 20]"):
        exp = oracle_topk(corpus_ts, q, k=10_000).toPandas()
        exp = exp[~exp["doc_id"].isin(removed_now)].head(8)
        got_l = search_local(index_dir, q, k=8)
        assert list(got_l["doc_id"]) == list(exp["doc_id"]), q
        assert [round(float(s), 6) for s in got_l["score"]] == [
            round(float(s), 6) for s in exp["score"]
        ], q
        got_d = search_distributed(spark, index_dir, q, k=8).toPandas()
        assert list(got_d["doc_id"]) == list(exp["doc_id"]), q


def test_or_reachable_range_and_pure_negative_all_paths(del_index, spark):
    """VERDICT r3 items 1+4: a Range clause that is OR-reachable (a doc can
    match with zero term hits) and mustNots-only queries must be
    rank-identical on the serving AND distributed paths vs the oracle.
    Termless matches enter at score 0.0, tie order (0.0, doc_id desc);
    removal masks compose on the termless branch too."""
    index_dir, with_ids = del_index
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")
    corpus_ts = with_ids.withColumn("ts", F.pmod(rowidx, F.lit(37)))
    removed_now = set(removal.removed_array(index_dir).tolist())
    cases = [
        ("rareterm0 OR ts:[0 TO 2]", 12),  # scored ∪ termless mix (df=1)
        ("NOT merge", 10),  # pure negative → Not(All, merge)
        ("lang:python AND NOT merge", 8),  # wholly termless w/ negative term
        ("merge OR ts:[0 TO 2]", 8),  # OR-reachable Range, scored fills k
    ]
    for q, k in cases:
        exp = oracle_topk(corpus_ts, q, k=10_000).toPandas()
        exp = exp[~exp["doc_id"].isin(removed_now)].head(k)
        got_l = search_local(index_dir, q, k=k)
        assert list(got_l["doc_id"]) == list(exp["doc_id"]), q
        assert [round(float(s), 6) for s in got_l["score"]] == [
            round(float(s), 6) for s in exp["score"]
        ], q
        got_d = search_distributed(spark, index_dir, q, k=k).toPandas()
        assert list(got_d["doc_id"]) == list(exp["doc_id"]), q
    # the first case must genuinely exercise BOTH branches
    mixed = oracle_topk(corpus_ts, cases[0][0], k=10_000).toPandas()
    mixed = mixed[~mixed["doc_id"].isin(removed_now)].head(12)
    assert (mixed["score"] > 0).any() and (mixed["score"] == 0).any()


def test_narrow_time_range_disjunction_sound(del_index, spark):
    """Regression: a pure disjunction + a NARROW time mask must not take the
    WAND fast path — θ seeds from unfiltered scores, so every in-range doc
    can sit below it and be pruned. Expected = brute force minus
    out-of-range minus removed, cut to k."""
    index_dir, with_ids = del_index
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")
    out_of_range = {
        r["doc_id"]
        for r in with_ids.withColumn("ts", F.pmod(rowidx, F.lit(37)))
        .filter(~F.col("ts").between(0, 1))
        .select("doc_id")
        .collect()
    }
    removed_now = set(removal.removed_array(index_dir).tolist())
    exp_ids, exp_scores = _expected(
        with_ids, "merge OR sort OR def", out_of_range | removed_now, k=5
    )
    assert exp_ids, "fixture must leave at least one in-range match"
    got = search_local(index_dir, "merge OR sort OR def", k=5, time_range=(0, 1))
    assert list(got["doc_id"]) == exp_ids
    assert [round(float(s), 6) for s in got["score"]] == exp_scores
