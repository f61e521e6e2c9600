"""Catwalk model gather + Strut scoring (J4/J5 full-fidelity shape).

Mirrors the reference's MiruStreamServiceNGTest-style assertions: the model
is non-empty with sane FeatureScore invariants (CatwalkQuestion.java:110-155,
Catwalk.java:95-205), Strut's scores are ordered and bounded
(Strut.java:200-218,367-407), and the StrutModelCache analog
(StrutModelCache.java) reuses the gathered model per input generation.
"""

from __future__ import annotations

import pytest

from miru_spark.operators import relational as rel


@pytest.fixture(autouse=True)
def _fresh_model_cache():
    rel.strut_model_cache_clear()
    yield
    rel.strut_model_cache_clear()


def test_catwalk_features_shape_and_invariants(spark, sf_dir):
    pdf = rel.catwalk_features(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert list(pdf.columns) == ["feature_id", "feature_key", "num_hi", "num_am", "denom"]
    assert set(pdf["feature_id"]) == {0, 1}
    # FeatureScore invariants: with NO featureFilter mask, every numerator
    # counts a subset of the denominator's docs (the reference logs
    # numerator > denominator as "invalid" — it must not happen here)
    assert (pdf["num_hi"] <= pdf["denom"]).all()
    assert (pdf["num_am"] <= pdf["denom"]).all()
    assert (pdf["denom"] > 0).all()
    # composite feature keys carry the '|' separator; single-field keys don't
    assert pdf[pdf["feature_id"] == 1]["feature_key"].str.contains(r"\|").all()
    assert not pdf[pdf["feature_id"] == 0]["feature_key"].str.contains(r"\|").any()
    # feature 1 refines feature 0: grouped by the event_type prefix, its
    # denominators sum back to feature 0's
    f1 = pdf[pdf["feature_id"] == 1].copy()
    f1["prefix"] = f1["feature_key"].str.split("|").str[0]
    sums = f1.groupby("prefix")["denom"].sum()
    f0 = pdf[pdf["feature_id"] == 0].set_index("feature_key")["denom"]
    assert sums.sort_index().tolist() == f0.sort_index().tolist()


def test_numerator_sets_are_topn_and_deterministic(spark, sf_dir):
    hi1, am1 = rel._catwalk_numerator_sets(spark, sf_dir)
    hi2, am2 = rel._catwalk_numerator_sets(spark, sf_dir)
    assert hi1 == hi2 and am1 == am2  # (count desc, user asc) is total
    assert 0 < len(hi1) <= rel._CATWALK_TOP_N_TERMS
    assert 0 < len(am1) <= rel._CATWALK_TOP_N_TERMS
    assert len(set(hi1)) == len(hi1)


def test_strut_scores_consume_model(spark, sf_dir):
    pdf = rel.strut_scores(spark, sf_dir, k=15).toPandas()
    assert len(pdf) == 15
    # UNIT_WEIGHTED finalize: every per-numerator score and the scaled score
    # are averages of [0,1] feature scores → bounded [0,1]; descending order
    for c in ("score_hi", "score_am", "score"):
        assert ((pdf[c] >= 0) & (pdf[c] <= 1)).all()
    assert (pdf["score"].diff().dropna() <= 0).all()
    # scaleScore with unit scalars: score == (t_hi + t_am)/2 over positives
    recomputed = (
        pdf["score_hi"].where(pdf["score_hi"] > 0, 0.0)
        + pdf["score_am"].where(pdf["score_am"] > 0, 0.0)
    ) / 2.0
    assert (recomputed - pdf["score"]).abs().max() < 2e-6  # both 6dp-rounded


def test_strut_model_cache_reuses_generation(spark, sf_dir, monkeypatch):
    calls = []
    real = rel.catwalk_features

    def counting(s, d):
        calls.append(d)
        return real(s, d)

    monkeypatch.setattr(rel, "catwalk_features", counting)
    rel.strut_scores(spark, sf_dir, k=5).collect()
    rel.strut_scores(spark, sf_dir, k=5).collect()
    assert calls == [sf_dir]  # warm second call — model served from cache
    # a different generation (other sf_dir) evicts and regathers
    import os

    other = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    assert other != sf_dir
    rel.strut_scores(spark, other, k=5).collect()
    assert calls == [sf_dir, other]


def test_merged_model_equals_union_trained(spark, sf_dir):
    """Cross-partition merge exactness (CatwalkModelService.merge :481-492):
    per-range models summed per (feature, value) must equal the
    union-trained catwalk_features counts — numerator sets are part of the
    query definition, so the merge is associative and lossless."""
    per_range = rel.catwalk_per_range_models(spark, sf_dir).toPandas()
    assert per_range["range_id"].nunique() > 1  # the split really happened
    summed = (
        per_range.groupby(["feature_id", "feature_key"], as_index=False)[
            ["num_hi", "num_am", "denom"]
        ]
        .sum()
        .sort_values(["feature_id", "feature_key"])
        .reset_index(drop=True)
    )
    union = (
        rel.catwalk_features(spark, sf_dir)
        .toPandas()
        .sort_values(["feature_id", "feature_key"])
        .reset_index(drop=True)
    )
    assert summed.equals(union[["feature_id", "feature_key", "num_hi", "num_am", "denom"]])


def test_merged_pruning_semantics(spark, sf_dir):
    """gatherMinFeatureScore keeps a row iff ANY numerator>0 clears the
    threshold STRICTLY (filterEligibleScores :355-369);
    gatherMaxFeatureScoresPerFeature cuts per feature by (max score desc,
    denom desc) (:769-777)."""
    pdf = rel.catwalk_merged(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    t = rel._CATWALK_MIN_SCORE
    s_hi = (pdf["num_hi"] / pdf["denom"]).round(6)
    s_am = (pdf["num_am"] / pdf["denom"]).round(6)
    ok = ((pdf["num_hi"] > 0) & (s_hi > t)) | ((pdf["num_am"] > 0) & (s_am > t))
    assert ok.all()
    counts = pdf.groupby("feature_id").size()
    assert (counts <= rel._CATWALK_MAX_PER_FEATURE).all()
    # the cut was actually exercised: the unpruned model has more feature-1
    # rows than survive
    full = rel.catwalk_features(spark, sf_dir).toPandas()
    assert (full["feature_id"] == 1).sum() > (pdf["feature_id"] == 1).sum()
    # n_models pins the per-range split (> 1 contributing range somewhere)
    assert pdf["n_models"].max() > 1


def test_strut_scores_identical_from_merged_model(spark, sf_dir):
    """J5 fed from the MERGED (unpruned) model must score identically to
    strut_scores' direct model — the service path and the query path agree
    (StrutModelCache + CatwalkModelService.getModel composition)."""
    direct = rel.strut_scores(spark, sf_dir).toPandas()
    per_range = rel.catwalk_per_range_models(spark, sf_dir).toPandas()
    merged = (
        per_range.groupby(["feature_id", "feature_key"], as_index=False)[
            ["num_hi", "num_am", "denom"]
        ].sum()
    )
    rel.strut_model_cache_clear()
    rel._STRUT_MODEL_CACHE[str(sf_dir)] = [
        tuple(r) for r in merged.itertuples(index=False)
    ]
    via_merged = rel.strut_scores(spark, str(sf_dir)).toPandas()
    assert via_merged["user_id"].tolist() == direct["user_id"].tolist()
    assert via_merged["score"].tolist() == direct["score"].tolist()


def test_strut_incremental_rescore_score_identical(spark, sf_dir, tmp_path):
    """Strut incremental rescoring (StrutModelCache + the lastScoredId
    gather, MiruAggregateUtil.java:136-249): fold events in TWO ingestion
    waves through catwalk_model_cache — the second update aggregates only
    rows above the recorded high water — then score from the cache. Must be
    score-identical to strut_scores' full retrain, and the second update
    must NOT have been a full recompute."""
    import pyspark.sql.functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    mid = int(events.agg(F.percentile_approx("event_id", 0.5)).first()[0])
    cache = rel.catwalk_model_cache(spark, str(sf_dir), str(tmp_path / "strutcache"))
    first = cache.update(events.filter(F.col("event_id") <= mid))
    assert first["full_recompute"]
    second = cache.update(events)
    assert not second["full_recompute"] and second["from_id"] == mid
    assert second["delta_rows"] > 0

    incr = rel.strut_scores_from_cache(spark, str(sf_dir), cache).toPandas()
    direct = rel.strut_scores(spark, str(sf_dir)).toPandas()
    assert incr["user_id"].tolist() == direct["user_id"].tolist()
    for c in ("score_hi", "score_am", "score"):
        assert incr[c].tolist() == direct[c].tolist(), c
