"""miru's analytics/reco plugin operators as declarative DataFrame programs.

Each function takes (spark, sf_dir) and returns a DataFrame over the driver's
synthetic tables. These are the Spark-native rewrites of miru's hand-written
bitmap programs (SURVEY.md §2.4-2.6): where miru loops a Roaring bitmap with
an elimination heap, we declare the equivalent relational plan and let
Catalyst pick hash aggregates / broadcast joins / TakeOrderedAndProject.

Scale notes: every groupBy here is a map-side-combinable hash aggregate;
joins against small dimensions are broadcast explicitly; top-N per group is
a window over the group key (shuffles once on the key, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A1/A4: Distincts.gather — distinct pivot values of a filtered doc set
# (miru-reco-plugins/.../distincts/Distincts.java:41-141: filter → gather
# distinct terms, optional prefix ranges). Bitmap elimination loop → built-in
# hash-distinct with pushed predicates.
def distincts_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("value") > 50.0) & F.col("event_type").startswith("c"))
        .select("event_type")
        .distinct()
        .orderBy("event_type")
    )


# --- A5/A6: DistinctCount / Uniques (DistinctCount.java:30-113) — the
# cross-partition dedup-by-report becomes a plain countDistinct shuffle.
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


# --- A7: AggregateCounts (AggregateCounts.java:93-405) — per group: count,
# latest doc, oldest doc. The newest-first elimination loop with cardinality
# deltas → max_by/min_by aggregates (one pass, map-side combinable).
def aggregate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max_by("event_id", F.struct("ts", "event_id")).alias("latest_event_id"),
            F.min_by("event_id", F.struct("ts", "event_id")).alias("oldest_event_id"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("latest_ts"),
        )
        .orderBy("event_type")
    )


# --- S10: paired-latest (miru-service/.../stream/MiruIndexPairedLatest.java)
# — latest activity per COMPOSITE (fieldA value, fieldB value) key; miru
# maintains a bitmap per pair updated newest-wins, which is exactly a
# max_by over the composite groupBy (one map-side-combinable pass).
def paired_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        ev.groupBy("event_type", "user_id")
        .agg(
            F.max_by("event_id", F.struct("ts", "event_id")).alias("latest_event_id"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("latest_ts"),
        )
        .orderBy("event_type", "user_id")
    )


# --- A8: Analytics waveform (Analytics.java:57-201) — constraint mask then
# boundedCardinalities over equal time segments → groupBy(window) counts.
def analytics_waveform(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy(
            F.col("event_type"), F.date_format(F.col("ts"), "yyyy-MM-dd").alias("bucket")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


# --- A10: Anomaly/Metrics bit-sliced SUM/AVG (Anomaly.java:22-130) — the
# per-bit cardinality*2^i trick exists only because miru lacks numeric
# columns; Spark sums natively.
def anomaly_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.col("ts"), "yyyy-MM-dd").alias("bucket"))
        .agg(
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.count("*").alias("n"),
        )
        .orderBy("bucket")
    )


# --- A11: Stumptown log tail (Stumptown.java:37-71) — last-K of filtered set
# via descending iterator → orderBy desc + limit (TakeOrderedAndProject).
def stumptown_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(20)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            "user_id",
            F.round("value", 6).alias("value"),
        )
    )


# --- A9: Trending + PeakDet (TrendingQuestion.java:65-181, PeakDet.java:22-80)
# — waveform per term, then local-max detection → window lag/lead.
def trending_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wave = ev.groupBy(
        "event_type", F.date_format(F.col("ts"), "yyyy-MM-dd").alias("bucket")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    return (
        wave.withColumn("prev", F.lag("n").over(w))
        .withColumn("next", F.lead("n").over(w))
        .filter((F.col("n") > F.col("prev")) & (F.col("n") > F.col("next")))
        .select("event_type", "bucket", "n")
        .orderBy("event_type", "bucket")
    )


# --- J3: CollaborativeFiltering 3-hop (CollaborativeFiltering.java:58-213):
# my field1 terms → others sharing them (minus me) → their other field2
# terms, scored by contributor counts, top-N. Three chained semi-joins +
# grouped sum — classic Spark; the small "my terms" sides are broadcast.
def reco_collaborative(spark: SparkSession, sf_dir: str, cust_key: int = 1) -> DataFrame:
    """'customer bought X; who else bought X; what else did they buy' over
    orders⋈lineitem — the exact 3-hop shape of miru's reco, with the same
    top-N heap at the end (CollaborativeFiltering.java:129-146,205-207)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Each hop FILTERS before it joins the fact table, so the full
    # orders⋈lineitem distinct (the r1 plan's cost center — and, cached, the
    # r2 regression: materializing every (custkey, partkey) pair to serve
    # three hops that each need only a thin slice) never exists at all:
    #   hop 1 (mine):   one customer's orders (parquet-pushed o_custkey
    #                   filter, a handful of rows) broadcast-semi into li;
    #   hop 2 (others): li pre-pruned map-side by broadcast(my partkeys),
    #                   THEN joined to orders for the custkeys;
    #   hop 3 (reco):   orders pre-pruned to the others custkeys, then one
    #                   fact join; countDistinct dedups (custkey, partkey)
    #                   inside the aggregate — no standalone distinct.
    # At 100 TB every pre-join prune survives: mine is always tiny
    # (broadcast), others/other-orders prune before the only big shuffle.
    my_orders = orders.filter(F.col("o_custkey") == cust_key).select("o_orderkey")
    mine = (
        li.join(F.broadcast(my_orders), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select(F.col("l_partkey").alias("partkey"))
        .distinct()
    )
    others = (
        li.join(F.broadcast(mine), li["l_partkey"] == mine["partkey"], "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_custkey") != cust_key)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    other_orders = orders.join(others, orders["o_custkey"] == others["custkey"], "left_semi")
    return (
        li.join(other_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(mine), li["l_partkey"] == mine["partkey"], "left_anti")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.countDistinct("o_custkey").alias("score"))
        .orderBy(F.desc("score"), "partkey")
        .limit(10)
    )


# --- F1/F3: boolean filter algebra and/or/pButNotQ
# (MiruFilterOperation.java:10-22, evaluator MiruAggregateUtil.java:1098-1241)
# — Column expression tree; Catalyst folds/pushes it into the scan.
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = F.col("event_type").isin("click", "view") | (F.col("value") > 90.0)
    q = F.col("user_id") % 10 == 0  # pButNotQ: p AND NOT q
    return (
        ev.filter(p & ~q)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


def filter_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`xor` filter op (MiruFilterOperation.java:16, marked "currently
    supported"): events where exactly one of {type is click/view, value>50}
    holds — odd-membership semantics, same as the query engine's Xor node."""
    ev = _t(spark, sf_dir, "events")
    a = F.col("event_type").isin("click", "view")
    b = F.col("value") > 50.0
    xor = (F.when(a, 1).otherwise(0) + F.when(b, 1).otherwise(0)) % 2 == 1
    return (
        ev.filter(xor)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


# --- F4: time-range mask (MiruBitmapsRoaring.java:506-521) — binary-searched
# docID range flip → plain BETWEEN predicate, pushed to the parquet scan.
def time_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10")) & (F.col("ts") < F.lit("2024-01-20"))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


# --- T2: TIME-strategy top-k (FullText.java:222-251) — newest-K, score 0.
def topk_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(10)
        .select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"), "user_id")
    )


# --- T5: generic per-group top-N heaps (MinMaxPriorityQueue uses across
# reco/catwalk) → window row_number <= N.
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.desc("user_id"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("event_type", "rank")
    )


# --- A3: gatherFeatures co-occurrence counting (MiruAggregateUtil.java:77-304)
# — distinct feature-combo counts per answer term → one grouped count.
def gather_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", (F.col("user_id") % 10).alias("user_bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "user_bucket")
    )


# --- J1: term IN-list semi-join (orMultiTx, MiruBitmapsRoaring.java:207-218).
def semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    big = lineitem.filter(F.col("l_quantity") > 45.0).select("l_orderkey").distinct()
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


# --- J2: anti-join / ANDNOT (andNotTx, MiruBitmapsRoaring.java:276-409).
def anti_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with NO high-quantity lineitem (ANDNOT over the doc-set)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48.0)
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus")
    )


# --- J6 small-list degenerate case: when the "bloom" side is a handful of
# literals, an IN-list beats any filter structure — the real bloom path
# (bounded-size bitmap + map-side probe) is bloom_prune_join above.
def bloom_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_brand").isin("Brand#1", "Brand#3"))
        .groupBy("p_brand", "p_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
        .orderBy("p_brand", "p_type")
    )


# --- J6 full fidelity: REAL bloom pruning before the join (the
# BloomIndex.mightContain role, BloomIndex.java:75-131) — see
# functions/bloom.py for the build/probe kernels.
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one very-high-value order, per market
    segment. The bloom over the (selective) build side's custkeys prunes
    the customer probe MAP-SIDE before the only shuffle; the exact semi
    join then removes bloom false positives, so the result is identical to
    the unpruned plan (the oracle never sees the bloom)."""
    from miru_spark.functions.bloom import build_bloom, might_contain_col

    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 495000.0)
        .select("o_custkey")
    )
    n_build = orders.count()  # tiny aggregate over the pushed-down scan
    bloom = build_bloom(orders, "o_custkey", expected_items=max(n_build, 1), fpp=0.01)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pruned = cust.filter(might_contain_col(F.col("c_custkey"), bloom, spark))
    return (
        pruned.join(orders, pruned["c_custkey"] == orders["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# --- J4/J5: Catwalk model gather + Strut model scoring
# (miru-stream-plugins/.../catwalk/CatwalkQuestion.java:74-253 gathers
# per-feature numerator/denominator counts; strut/Strut.java:74-435 scores
# candidates against the broadcast model;
# miru-catwalk-shared/.../StrutModelScore.java:8-13 is {numerators[],
# denominator}). Features here are event_type values; numerators are two
# predicate counts (value>50, even user), denominator the feature's total.
def catwalk_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-gather half (J4), simplest shape: per feature, numerator/
    denominator counts in ONE map-side-combinable pass (CatwalkQuestion's
    answers[] counts). ``catwalk_features`` below is the full-fidelity
    model; this flat variant stays as the cheap single-pass entry."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0)).alias("num_hi"),
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("num_even"),
            F.count("*").alias("denom"),
        )
        .orderBy("event_type")
    )


# Catwalk definition shared by catwalk_features / strut_scores — mirrors the
# reference's CatwalkDefinition{gatherField, features[], modelFilters[]}
# (miru-catwalk-shared/.../CatwalkQuery.java): the gather/pivot field is
# user_id (the candidates being modeled), two numerator model filters, two
# feature definitions (one single-field, one composite to exercise the
# multi-field termIds path).
_CATWALK_TOP_N_TERMS = 40  # topNTermsPerNumerator (CatwalkQuestion.java:64)
_CATWALK_N_RANGES = 4  # partition ranges for the model-merge (FeatureRange analog)
_CATWALK_MIN_SCORE = 0.05  # gatherMinFeatureScore (CatwalkModelService ctor)
_CATWALK_MAX_PER_FEATURE = 20  # gatherMaxFeatureScoresPerFeature


def _catwalk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc projection: numerator-filter flags + one key per feature.
    Feature 0 = (event_type); feature 1 = (event_type, floor(value/25))
    composed with '|' exactly like functions/composer.py composite terms.
    ``range_id`` slices the activity stream into time-ordered partition
    ranges (the deployable's FeatureRange fromPartitionId..toPartitionId
    analog) for the cross-partition model merge."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        (F.col("value") > 50.0).alias("is_hi"),
        (F.hour("ts") < 12).alias("is_am"),
        F.col("event_type").alias("fkey0"),
        F.concat_ws(
            "|", "event_type", F.floor(F.col("value") / 25).cast("int").cast("string")
        ).alias("fkey1"),
        F.pmod(F.dayofyear("ts"), F.lit(_CATWALK_N_RANGES)).cast("int").alias("range_id"),
    )


def _catwalk_numerator_sets(spark: SparkSession, sf_dir: str) -> tuple[list, list]:
    """Top-N gather-field terms per numerator filter — the reference gathers
    each numerator's eligible docs and keeps the ``topNTermsPerNumerator``
    most frequent pivot terms (CatwalkQuestion.java:110-155, MinMaxPriorityQueue
    on TermIdAndCount). ONE fact scan computes both numerators' per-user
    counts (map-side combine); the two top-N selections then run over the
    small (user, c_hi, c_am) aggregate. Ties break (count desc, user asc).
    The sets are bounded by a constant (40), so driver-side lists — exactly
    the reference's in-memory numeratorTermSets — are scale-safe."""
    per_user = (
        _catwalk_docs(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("is_hi"), 1).otherwise(0)).alias("c_hi"),
            F.sum(F.when(F.col("is_am"), 1).otherwise(0)).alias("c_am"),
        )
    )
    from miru_spark.functions.cache import scoped_cache

    per_user = scoped_cache(per_user, "catwalk_per_user")
    sets = []
    for c in ("c_hi", "c_am"):
        rows = (
            per_user.filter(F.col(c) > 0)
            .orderBy(F.desc(c), F.asc("user_id"))
            .limit(_CATWALK_TOP_N_TERMS)
            .select("user_id")
            .collect()
        )
        sets.append([r[0] for r in rows])
    return sets[0], sets[1]


def catwalk_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-fidelity J4 model: FeatureScore{termIds, numerators[], denominator}
    rows keyed by (feature_id, feature term tuple) — CatwalkQuestion.java:110-155
    gathers per-numerator top-N pivot terms, Catwalk.java:95-205 then counts,
    per feature value, the docs whose pivot term is in each numerator set
    (numerators[]) and the feature value's total doc count (denominator;
    no featureFilter mask — MiruFilter.NO_FILTER path).

    Plan: two fact scans total — one map-combined aggregate for both
    numerator term sets, one explode(2)+aggregate for all feature counts.
    The bounded term sets ride into the scan as isin literals (no join, no
    shuffle of the membership)."""
    hi_ids, am_ids = _catwalk_numerator_sets(spark, sf_dir)
    docs = _catwalk_docs(spark, sf_dir)
    feat = docs.select(
        "user_id",
        "is_hi",
        "is_am",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("feature_id"), F.col("fkey0").alias("feature_key")),
                F.struct(F.lit(1).alias("feature_id"), F.col("fkey1").alias("feature_key")),
            )
        ).alias("f"),
    ).select("user_id", "f.feature_id", "f.feature_key")
    return (
        feat.groupBy("feature_id", "feature_key")
        .agg(
            F.sum(F.when(F.col("user_id").isin(hi_ids), 1).otherwise(0)).alias("num_hi"),
            F.sum(F.when(F.col("user_id").isin(am_ids), 1).otherwise(0)).alias("num_am"),
            F.count("*").alias("denom"),
        )
        .orderBy("feature_id", "feature_key")
    )


def catwalk_per_range_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One catwalk_features model PER partition range: the deployable stores
    ModelFeatureScores keyed by (feature, fromPartitionId..toPartitionId)
    (CatwalkModelService.saveModel). The numerator gather-sets are part of
    the query DEFINITION (CatwalkQuery features/modelFilters), so every
    range counts its slice against the SAME sets — which is exactly what
    makes the merge below exact."""
    hi_ids, am_ids = _catwalk_numerator_sets(spark, sf_dir)
    docs = _catwalk_docs(spark, sf_dir)
    feat = docs.select(
        "user_id",
        "range_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("feature_id"), F.col("fkey0").alias("feature_key")),
                F.struct(F.lit(1).alias("feature_id"), F.col("fkey1").alias("feature_key")),
            )
        ).alias("f"),
    ).select("user_id", "range_id", "f.feature_id", "f.feature_key")
    return feat.groupBy("range_id", "feature_id", "feature_key").agg(
        F.sum(F.when(F.col("user_id").isin(hi_ids), 1).otherwise(0)).alias("num_hi"),
        F.sum(F.when(F.col("user_id").isin(am_ids), 1).otherwise(0)).alias("num_am"),
        F.count("*").alias("denom"),
    )


def catwalk_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-partition Catwalk model merge — the piece that turns J4/J5 from
    a query into a SERVICE (miru-catwalk-deployable/.../CatwalkModelService
    .java:100-237): per-partition-range ModelFeatureScores merge by summing
    numerators and denominators per (feature, feature value) (``merge()``
    :481-492); the merged model is then pruned by gatherMinFeatureScore
    (filterEligibleScores :355-369 — keep a row iff ANY numerator>0 has
    num/denom STRICTLY above the threshold) and cut to
    gatherMaxFeatureScoresPerFeature per feature ordered by (max
    per-numerator score desc, denominator desc)
    (FEATURE_SCORES_PER_FEATURE_COMPARATOR :769-777; feature_key asc added
    as the deterministic final tiebreak).

    Because every range counts against the same gather-sets, the merged
    sums provably equal union-trained counts — the oracle trains on the
    union and must hash-match, proving the merge is exact (associative,
    lossless). ``n_models`` = distinct contributing ranges per row pins
    that the per-range split really happened.

    Plan: per-range models are a map-side-combined aggregate keyed by
    (range, feature, value); the merge is a second tiny aggregate over
    model rows (bounded by the feature-value vocabulary, NOT the corpus);
    pruning is one window over the merged model. At 100 TB the fact scan
    happens once per range-increment (incremental saveModel), never at
    query time."""
    per_range = catwalk_per_range_models(spark, sf_dir)
    merged = per_range.groupBy("feature_id", "feature_key").agg(
        F.sum("num_hi").alias("num_hi"),
        F.sum("num_am").alias("num_am"),
        F.sum("denom").alias("denom"),
        F.countDistinct("range_id").alias("n_models"),
    )
    # round-then-compare on BOTH engines (CLAUDE.md threshold rule)
    s_hi = F.round(F.col("num_hi") / F.col("denom"), 6)
    s_am = F.round(F.col("num_am") / F.col("denom"), 6)
    eligible = ((F.col("num_hi") > 0) & (s_hi > _CATWALK_MIN_SCORE)) | (
        (F.col("num_am") > 0) & (s_am > _CATWALK_MIN_SCORE)
    )
    max_score = F.greatest(s_hi, s_am)
    w = Window.partitionBy("feature_id").orderBy(
        F.desc("max_score"), F.desc("denom"), F.asc("feature_key")
    )
    return (
        merged.filter(eligible)
        .withColumn("max_score", max_score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CATWALK_MAX_PER_FEATURE)
        .select(
            "feature_id", "feature_key", "num_hi", "num_am", "denom",
            "n_models", "max_score",
        )
        .orderBy("feature_id", "feature_key")
    )


# StrutModelCache analog (miru-stream-plugins/.../strut/StrutModelCache.java):
# repeated Strut queries reuse the gathered model; keyed by the input
# generation (sf_dir here — a rebuilt/other corpus evicts and regathers).
_STRUT_MODEL_CACHE: dict[str, list] = {}


def strut_model_cache_clear() -> None:
    _STRUT_MODEL_CACHE.clear()


def _strut_model_rows(spark: SparkSession, sf_dir: str) -> list:
    cached = _STRUT_MODEL_CACHE.get(sf_dir)
    if cached is None:
        cached = catwalk_features(spark, sf_dir).collect()
        _STRUT_MODEL_CACHE.clear()  # single-generation cache, like scoped_cache
        _STRUT_MODEL_CACHE[sf_dir] = cached
    return cached


def strut_scores(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """The scoring half (J5), consuming the full catwalk_features model.
    Per Strut.java:200-218 each candidate feature VALUE contributes
    s_i = min(numerator_i/denominator, 1); score() (:355-365, UNIT_WEIGHTED,
    scalar 1) MAX-accumulates s_i across the candidate's values of the same
    featureId; finalizeScore (:367-382) sums positive per-feature scores over
    the TOTAL feature count; scaleScore (:399-407, numeratorScalars=1)
    repeats UNIT_WEIGHTED across the numerators. Top-k (score desc, user asc).

    The model is bounded by the feature-value vocabulary → broadcast join;
    candidates shuffle only distinct (user, feature) pairs."""
    model_rows = _strut_model_rows(spark, sf_dir)
    model = spark.createDataFrame(
        model_rows,
        "feature_id int, feature_key string, num_hi long, num_am long, denom long",
    )
    return _strut_rank(spark, sf_dir, model, k)


def _strut_rank(spark: SparkSession, sf_dir: str, model: DataFrame, k: int) -> DataFrame:
    """Shared Strut scoring tail: candidates × (broadcast) model → per-feature
    max → UNIT_WEIGHTED finalize → top-k. One copy of the score contract so
    the direct, merged-model, and incremental-cache paths cannot drift."""
    n_features, n_numerators = 2, 2
    docs = _catwalk_docs(spark, sf_dir)
    cand = (
        docs.select(
            "user_id",
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("feature_id"), F.col("fkey0").alias("feature_key")),
                    F.struct(F.lit(1).alias("feature_id"), F.col("fkey1").alias("feature_key")),
                )
            ).alias("f"),
        )
        .select("user_id", "f.feature_id", "f.feature_key")
        .distinct()
    )
    s_hi = F.least(F.col("num_hi") / F.col("denom"), F.lit(1.0))
    s_am = F.least(F.col("num_am") / F.col("denom"), F.lit(1.0))
    per_feat = (
        cand.join(F.broadcast(model), ["feature_id", "feature_key"])
        .groupBy("user_id", "feature_id")
        .agg(F.max(s_hi).alias("s_hi"), F.max(s_am).alias("s_am"))
    )
    per_user = per_feat.groupBy("user_id").agg(
        (F.sum(F.when(F.col("s_hi") > 0, F.col("s_hi")).otherwise(0.0)) / n_features).alias("t_hi"),
        (F.sum(F.when(F.col("s_am") > 0, F.col("s_am")).otherwise(0.0)) / n_features).alias("t_am"),
    )
    score = (
        F.when(F.col("t_hi") > 0, F.col("t_hi")).otherwise(0.0)
        + F.when(F.col("t_am") > 0, F.col("t_am")).otherwise(0.0)
    ) / n_numerators
    return (
        per_user.select(
            "user_id",
            F.round("t_hi", 6).alias("score_hi"),
            F.round("t_am", 6).alias("score_am"),
            F.round(score, 6).alias("score"),
        )
        # order on the ROUNDED score: float sum order varies per engine, so
        # unrounded "ties" aren't exact — 6-dp ties break on user_id instead
        .orderBy(F.desc("score"), F.asc("user_id"))
        .limit(k)
    )


def catwalk_model_cache(spark: SparkSession, sf_dir: str, cache_dir: str):
    """Strut incremental rescoring, the ingestion half: the strut model
    maintained as an incremental FeatureCache (StrutModelCache.java composed
    with the lastScoredId gather protocol, MiruAggregateUtil.java:136-249) —
    new activity folds into the model WITHOUT a full retrain.

    The cache is keyed by (feature_id, feature_key, kind) where kind ∈
    {all, hi, am}: 'all' counts every doc of the feature value (the
    FeatureScore denominator), 'hi'/'am' count docs whose pivot term is in
    that numerator's gather set (the numerators). The gather sets are part
    of the query DEFINITION (CatwalkQuery modelFilters), fixed at model
    registration — which is precisely what makes incremental folding exact:
    counts are pure sums over rows. ``update(events)`` aggregates only rows
    above the recorded lastScoredId (pushed-predicate delta scan) and merges
    |feature vocabulary| rows, never the fact table."""
    from miru_spark.operators.feature_cache import FeatureCache

    hi_ids, am_ids = _catwalk_numerator_sets(spark, sf_dir)

    def prepare(ev: DataFrame) -> DataFrame:
        return catwalk_kind_rows(ev, hi_ids, am_ids)

    return FeatureCache(
        spark,
        cache_dir,
        key_cols=["feature_id", "feature_key", "kind"],
        prepare=prepare,
        id_col="event_id",
    )


def catwalk_kind_rows(
    ev: DataFrame,
    hi_ids: list,
    am_ids: list,
    range_id: int | None = None,
    n_ranges: int = _CATWALK_N_RANGES,
) -> DataFrame:
    """Project raw events into (feature_id, feature_key, kind) count rows —
    the Feature pack the incremental cache and the persisted model store
    both aggregate. kind ∈ {all, hi, am}: 'all' counts every doc of the
    feature value (the FeatureScore denominator); 'hi'/'am' count docs
    whose pivot term is in that numerator's gather set. The gather sets are
    passed IN (fixed at model registration — CatwalkQuery modelFilters),
    which is what makes incremental folding exact: counts are pure sums.
    ``range_id`` restricts to one partition range (the per-range saveModel
    slice, CatwalkModelService.java:100-155); the filter is a pushed
    predicate over the derived column, all map-side. ``n_ranges`` MUST be
    the store's registered range count — hashing with a different modulus
    than the store folds with would silently drop events from ranges the
    store never visits (CatwalkModelStore passes its own)."""
    d = ev.select(
        "user_id",
        F.col("event_type").alias("fkey0"),
        F.concat_ws(
            "|", "event_type", F.floor(F.col("value") / 25).cast("int").cast("string")
        ).alias("fkey1"),
        F.pmod(F.dayofyear("ts"), F.lit(int(n_ranges))).cast("int").alias("range_id"),
    )
    if range_id is not None:
        d = d.filter(F.col("range_id") == F.lit(int(range_id)))
    feat = d.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("feature_id"), F.col("fkey0").alias("feature_key")),
                F.struct(F.lit(1).alias("feature_id"), F.col("fkey1").alias("feature_key")),
            )
        ).alias("f"),
    ).select("user_id", "f.feature_id", "f.feature_key")
    kinds = F.filter(
        F.array(
            F.lit("all"),
            F.when(F.col("user_id").isin(hi_ids), F.lit("hi")),
            F.when(F.col("user_id").isin(am_ids), F.lit("am")),
        ),
        lambda x: x.isNotNull(),
    )
    return feat.select("feature_id", "feature_key", F.explode(kinds).alias("kind"))


def strut_scores_from_cache(
    spark: SparkSession, sf_dir: str, cache, k: int = 20
) -> DataFrame:
    """Strut incremental rescoring, the serving half: reconstruct the
    FeatureScore model from the cache's (feature, value, kind) counts (a
    tiny parquet read bounded by the feature vocabulary — the fact table is
    never touched) and run the shared scoring tail. Score-identical to
    strut_scores' full retrain by construction (counts are sums); pinned in
    tests with a split-ingestion cache."""
    return _strut_rank(spark, sf_dir, model_from_kind_counts(cache.counts()), k)


def model_from_kind_counts(counts: DataFrame) -> DataFrame:
    """Reshape (feature_id, feature_key, kind, n) cache counts into the
    FeatureScore model relation (num_hi, num_am, denom) — shared by the
    incremental cache serving path above and the persisted model store
    (operators/catwalk_store.py). Counts are sums, so the same reshape is
    exact whether the input is one cache or a union of per-range caches."""
    return (
        counts.groupBy("feature_id", "feature_key")
        .agg(
            F.coalesce(F.sum(F.when(F.col("kind") == "hi", F.col("n"))), F.lit(0)).alias("num_hi"),
            F.coalesce(F.sum(F.when(F.col("kind") == "am", F.col("n"))), F.lit(0)).alias("num_am"),
            F.coalesce(F.sum(F.when(F.col("kind") == "all", F.col("n"))), F.lit(0)).alias("denom"),
        )
        .select(
            F.col("feature_id").cast("int"),
            "feature_key",
            F.col("num_hi").cast("long"),
            F.col("num_am").cast("long"),
            F.col("denom").cast("long"),
        )
    )


# --- General relational breadth: TPC-H-style agg + 3-way join with a
# broadcast dimension (proves the engine isn't fulltext-only).
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )
