"""Text analysis: language-ID, quality scoring, token counting, fingerprinting.

All JVM-side array/string expressions (no Python in the plan), each with an
exact DuckDB oracle. These run over the `documents` table but are written to
be applied to any (id, text) relation at 100 TB — one scan, map-side aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from miru_spark.analyzer import tokens_col
from miru_spark.functions.cache import scoped_cache

# tiny per-language marker vocabularies (n-gram heuristic stand-in; the
# driver's corpus marks language by common-word distribution)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "zh": ["de", "shi", "le", "wo", "ni"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split-gated spread: repartitions ONLY single-row-group bench files;
    # multi-split production inputs get the bare scan (no pre-map Exchange)
    from miru_spark.sources import read_spread

    return read_spread(spark, f"{sf_dir}/documents.parquet")


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang token statistics: docs, total tokens (whitespace+regex
    analyzer), distinct terms, BPE-ish subword count (4-char chunks —
    a deterministic stand-in for a BPE vocab)."""
    docs = _docs(spark, sf_dir).select("lang", tokens_col("text").alias("toks"))
    toks = F.col("toks")
    # integer subword count per token: (len+3)//4 — floor BEFORE summing so
    # the DuckDB oracle's integer division matches exactly
    n_sub = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor((F.length(t) + 3) / 4).cast("long"),
    )
    per_doc = docs.select(
        "lang", F.size(toks).alias("nt"), n_sub.alias("ns"), "toks"
    ).persist()
    distinct = (
        per_doc.select("lang", F.explode_outer(toks).alias("term"))
        .groupBy("lang")
        .agg(F.countDistinct("term").alias("n_distinct_terms"))
    )
    out = (
        distinct.join(
            per_doc.groupBy("lang").agg(
                F.count("*").alias("n_docs"),
                F.sum("nt").alias("n_tokens"),
                F.sum("ns").alias("n_subwords"),
            ),
            "lang",
        )
        .select("lang", "n_docs", "n_tokens", "n_distinct_terms", "n_subwords")
        .orderBy("lang")
    )
    # the result is one row per lang — materialize it so the tokenized
    # per_doc cache can be released instead of pinning executor memory for
    # the rest of the session
    rows = out.collect()
    per_doc.unpersist()
    return spark.createDataFrame(rows, out.schema)


def quality_scores(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Heuristic quality score per doc: length, mean token length, stopword
    ratio, alpha ratio — the C4/Gopher-style filters as one JVM expression.
    Returns bottom-k (the docs a pipeline would drop)."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text", tokens_col("text").alias("toks"))
    n, score = _quality_exprs()
    return (
        docs.select(
            "doc_id",
            "lang",
            n.alias("n_tokens"),
            F.round(score, 6).alias("quality"),
        )
        .orderBy(F.asc("quality"), F.asc("doc_id"))
        .limit(k)
    )


def _quality_exprs():
    """(n_tokens, score) column pair over materialized ``text``+``toks``
    columns — ONE definition shared by quality_scores and training_shards
    (must stay in parity with the oracle's quality expression)."""
    toks = F.col("toks")
    n = F.size(toks)
    sw_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    sw = F.size(F.filter(toks, lambda t: F.array_position(sw_arr, t) > 0))
    mean_tok_len = F.when(n > 0, F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n).otherwise(0.0)
    alpha_ratio = F.when(
        F.length("text") > 0,
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")) / F.length("text"),
    ).otherwise(0.0)
    score = (
        F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1.0 - sw / F.greatest(n, F.lit(1))) * 0.2
        + F.least(mean_tok_len / F.lit(8.0), F.lit(1.0)) * 0.2
        + alpha_ratio * 0.2
    )
    return n, score


def training_shards(
    spark: SparkSession, sf_dir: str, quality_min: float = 0.5, shard_tokens: int = 20_000
) -> DataFrame:
    """The capstone composition a training-data pipeline ships: quality-
    filter the corpus (same expression as `quality_scores`, round-then-
    compare like every threshold gate), then pack surviving docs into
    fixed-token-budget shards per lang in deterministic doc_id order:
    shard = floor(tokens accumulated BEFORE the doc / shard_tokens), so a
    doc never splits and every shard except the last holds >= shard_tokens.

    Scale shape — two-level distributed prefix sum: a window partitioned
    only by lang makes one fat task per lang (measured 109 s at 1M docs /
    5 langs on 32 cores). Instead, docs bucket by contiguous doc_id ranges;
    the per-doc cumsum runs within (lang, bucket) — parallelism = number of
    buckets — and bucket totals (a relation of #buckets rows, not #docs)
    get their own per-lang prefix window, broadcast back as offsets.
    global_cum = within-bucket cum + bucket offset, exactly. Output per
    shard: (lang, shard, n_docs, n_tokens)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", "text", tokens_col("text").alias("toks")
    )
    n, score = _quality_exprs()
    bucket_width = 4096  # doc_ids per cumsum bucket (parallelism knob)
    # cache the few-ints-per-doc projection UNFILTERED, then filter off the
    # cache: (a) the offsets branch below is a separate job (broadcast
    # build) and would otherwise re-run the tokenize+quality pass; (b) a
    # filter on the computed q re-evaluates the quality expression per
    # operator — the higher-order stopword filter falls back from
    # whole-stage codegen, so there is no CSE across filter/project and the
    # scan measured 3.3x slower (110 s vs 34 s at 1M docs) with the
    # predicate inside the cached plan
    scored = scoped_cache(
        docs.select(
            "doc_id",
            "lang",
            n.alias("n_tokens"),
            F.round(score, 6).alias("q"),
            F.floor(F.col("doc_id") / F.lit(bucket_width)).alias("bkt"),
        ),
        "training_shards_kept",
    )
    kept = scored.filter(F.col("q") >= quality_min)
    wb = (
        Window.partitionBy("lang", "bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_cum = F.coalesce(F.sum("n_tokens").over(wb), F.lit(0))
    bkt_tot = kept.groupBy("lang", "bkt").agg(F.sum("n_tokens").alias("tot"))
    wo = (
        Window.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bkt_tot.select(
        "lang", "bkt", F.coalesce(F.sum("tot").over(wo), F.lit(0)).alias("off")
    )
    cum_before = local_cum + F.col("off")
    return (
        kept.join(F.broadcast(offsets), ["lang", "bkt"])
        .withColumn("shard", F.floor(cum_before / F.lit(shard_tokens)))
        .groupBy("lang", "shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .orderBy("lang", "shard")
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: predicted lang = argmax marker hits (ties →
    lexicographically smallest lang). Output: confusion counts
    (lang, lang_pred, n) — deterministic and oracle-checkable."""
    # materialize the token array ONCE per row — referencing tokens_col per
    # lang would re-run the regex split 5x (measured ~4x slower)
    docs = _docs(spark, sf_dir).select("lang", tokens_col("text").alias("toks"))
    toks = F.col("toks")
    # deterministic argmax over langs as ONE array_max over (hits, -index)
    # structs: each lang's hits expression appears exactly once in the plan.
    # A when-chain fold here embeds lang k's hits inside every later branch
    # (~3^k copies once CollapseProject inlines them) — measured 244 s vs
    # 33 s at 1M docs for semantically identical output. struct max = max
    # hits, then max(-i) = min index = lexicographically-first lang, the
    # same tie rule the oracle's argmax uses.
    langs = sorted(LANG_MARKERS)
    def _hits(lang: str):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_position(arr, t) > 0))
    cand = F.array(
        *[F.struct(_hits(l).alias("h"), F.lit(-i).alias("ni")) for i, l in enumerate(langs)]
    )
    best = F.array_max(cand)
    pred = F.element_at(F.array(*[F.lit(l) for l in langs]), -best["ni"] + 1)
    return (
        docs.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "lang_pred")
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint = md5 of the normalized token stream (lowercase,
    single-space joined) — robust to whitespace/punctuation-only edits.
    Output: per-lang distinct fingerprints vs docs (dup rate)."""
    docs = _docs(spark, sf_dir)
    fp = F.md5(F.concat_ws(" ", tokens_col("text")))
    return (
        docs.select("lang", fp.alias("fp"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.countDistinct("fp").alias("n_distinct"))
        .orderBy("lang")
    )


def winnow_fingerprints(spark: SparkSession, sf_dir: str, w: int = 4) -> DataFrame:
    """Winnowing rolling-hash fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every 3-token shingle, slide a
    window of ``w`` hashes, keep each window's minimum. Guarantees any
    shared run of >= w+2 tokens between two docs shares a fingerprint,
    while storing ~2/(w+1) of the shingle hashes — the document-
    fingerprinting density/recall trade a 100-TB dedup pipeline tunes.

    The shingle hashes explode to ROWS and the sliding min runs as a
    bounded window frame per doc — NOT as nested array transforms: Catalyst
    collapses stacked projections, so an array-of-window-mins expression
    re-inlines (and re-md5s) the whole shingle-hash array once PER WINDOW —
    measured 1000x slower. The row form hashes each shingle exactly once.
    Output: per-lang docs-with-fingerprints, total and distinct
    fingerprint counts."""
    from pyspark.sql.window import Window

    from miru_spark.pipeline.dedup import _h

    docs = _docs(spark, sf_dir)
    with_toks = docs.select("lang", "doc_id", tokens_col("text").alias("toks"))
    toks = F.col("toks")
    n_sh = F.greatest(F.size(toks) - 2, F.lit(0))
    hashed = with_toks.select(
        "lang",
        "doc_id",
        F.transform(
            F.slice(toks, 1, n_sh),
            lambda _, i: _h(F.concat_ws(" ", F.slice(toks, i + 1, 3))),
        ).alias("hs"),
    )
    exploded = hashed.select("lang", "doc_id", F.posexplode("hs").alias("pos", "h"))
    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    wins = exploded.select(
        "lang",
        "doc_id",
        F.min("h").over(frame).alias("fp"),
        F.count("h").over(frame).alias("cnt"),  # == w ⇔ a full window starts here
    ).filter(F.col("cnt") == w)
    flat = wins.select("lang", "doc_id", "fp").distinct()
    return (
        flat.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs_with_fps"),
            F.count("*").alias("n_fps"),
            F.countDistinct("fp").alias("n_distinct_fps"),
        )
        .orderBy("lang")
    )


def stratified_split(
    spark: SparkSession, sf_dir: str, train_pct: int = 90, val_pct: int = 5
) -> DataFrame:
    """Deterministic train/val/test assignment + per-(lang, split) audit.

    The split a 100 TB training pipeline actually needs: membership is a
    pure function of doc_id (salted 48-bit md5 bucket mod 100 — the same
    DuckDB-parity hash the dedup family uses), so it is reproducible across
    runs, stable under repartitioning, and MAP-ONLY — no shuffle to assign,
    and the audit aggregation groups on ~(langs × 3) keys. Never sample with
    rand(): re-runs and stragglers' task retries would flip membership.
    Token counts are integer sums (order-insensitive — safe to repartition).
    """
    docs = _docs(spark, sf_dir)
    bkt = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split#"), F.col("doc_id").cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bkt < train_pct, "train")
        .when(bkt < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"), F.size(tokens_col("text")).alias("nt"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").cast("long").alias("n_tokens"))
        .orderBy("lang", "split")
    )


def ngram_repetition(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Within-doc n-gram repetition (the Gopher-style quality signal): the
    fraction of a doc's 3-token shingles that are repeats of an earlier
    shingle in the SAME doc. Boilerplate/spam pages score high; prose
    scores near zero.

    Plan: one scan, all-JVM array expressions (tokens materialized once,
    shingles via the shared `_shingle_expr`), per-doc arithmetic, one tiny
    per-lang aggregate. The per-doc fraction is emitted as integer PPM
    (round((n3-nd)*1e6/n3)) so the per-lang sum is order-insensitive and
    the >= 20% threshold is an INTEGER compare on both engines — no float
    threshold window (CLAUDE.md round-then-compare rule)."""
    from miru_spark.pipeline.dedup import _shingle_expr

    docs = _docs(spark, sf_dir)
    per_doc = docs.select(
        "lang", tokens_col("text").alias("toks")
    ).select("lang", _shingle_expr(n).alias("grams"))
    n3 = F.size("grams")
    nd = F.size(F.array_distinct("grams"))
    rep_ppm = F.round((n3 - nd) * F.lit(1000000.0) / F.greatest(n3, F.lit(1))).cast("long")
    return (
        per_doc.select("lang", rep_ppm.alias("rep_ppm"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("rep_ppm").cast("long").alias("sum_rep_ppm"),
            F.sum(F.when(F.col("rep_ppm") >= 200000, 1).otherwise(0))
            .cast("long")
            .alias("n_repetitive"),
        )
        .orderBy("lang")
    )


def _hash48(col, salt: str):
    """Salted 48-bit md5 bucket — the same portable hash the split/dedup
    family uses (DuckDB side: ('0x' || substr(md5(...),1,12))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 12), 16, 10
    ).cast("long")


def quota_sample(docs: DataFrame, quota: int, id_col: str = "doc_id",
                 group_col: str = "source") -> DataFrame:
    """Core of `domain_quota_sample` over any (id, group, ...) relation:
    keep, per group, the `quota` rows with the smallest salted-48-bit
    md5(id) — a deterministic uniform sample, reproducible across runs,
    repartition-stable, never rand(). Returns the kept rows + `n_total`.

    Scale shape: the naive form is one window partitioned by group — one
    fat task per hot domain (the training_shards lesson: domain skew is the
    norm in crawl data). Instead: (1) per-group counts (map-side-combined
    agg, |groups| rows) broadcast back; (2) groups with n <= 4*quota keep
    every row for the exact window (already O(quota)-sized); bigger groups
    pre-filter MAP-SIDE to the smallest 2*quota/n fraction of hash space,
    so E[window input] = 2*quota rows per group regardless of skew — the
    window task is O(quota) even for a group holding half the corpus.
    The pre-filter is an optimization with a LOUD failure mode, not a
    semantics change: for it to starve a group below quota, fewer than
    quota of n uniform hashes would have to land below 2*quota/n
    (Chernoff: P < exp(-quota/4); deterministic per corpus) — and
    `domain_quota_sample`'s audit raises on that instead of shipping a
    biased sample, so the contract stays exactly top-quota-by-hash."""
    h = _hash48(F.col(id_col), "quota#")
    counts = docs.groupBy(group_col).agg(F.count("*").alias("n_total"))
    joined = docs.withColumn("_h", h).join(F.broadcast(counts), group_col)
    thresh = (F.lit(2.0 * quota * float(2**48)) / F.col("n_total")).cast("long")
    pre = joined.filter(
        (F.col("n_total") <= F.lit(4 * quota)) | (F.col("_h") < thresh)
    )
    w = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        pre.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_h", "_rk")
    )


def domain_quota_sample(spark: SparkSession, sf_dir: str, quota: int = 10) -> DataFrame:
    """Per-source quota capping — the corpus-balancing op a training
    pipeline runs so one crawl domain cannot dominate the mixture. Audit
    output per source: (source, n_total, n_kept, kept_id_sum, kept_chars);
    kept_id_sum is the integer checksum of WHICH docs were kept (order-
    insensitive, exact on both engines). n_kept is wrapped in a loud
    runtime check: if the scale pre-filter in `quota_sample` ever starved
    a source below min(n_total, quota), the plan raises instead of
    returning a biased sample."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    kept = quota_sample(docs, quota)
    audit = kept.groupBy("source", "n_total").agg(
        F.count("*").alias("n_kept_raw"),
        F.sum("doc_id").cast("long").alias("kept_id_sum"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )
    expected = F.least(F.col("n_total"), F.lit(quota))
    n_kept = F.when(
        F.col("n_kept_raw") < expected,
        F.raise_error(
            F.concat(
                F.lit("quota_sample pre-filter starved source "), F.col("source")
            )
        ).cast("long"),
    ).otherwise(F.col("n_kept_raw"))
    return audit.select(
        "source", "n_total", n_kept.alias("n_kept"), "kept_id_sum", "kept_chars"
    ).orderBy("source")


def pack_sequences(
    spark: SparkSession, sf_dir: str, seq_len: int = 2048
) -> DataFrame:
    """Concat-and-chunk sequence packing audit — the last hop before a
    tokenized corpus becomes training batches: per lang, docs concatenate
    in deterministic doc_id order into one token stream that splits into
    fixed ``seq_len`` sequences (docs MAY straddle sequence boundaries —
    the GPT-style packing that wastes no tokens, vs the pad-per-doc form).
    The packing itself is a pure function of each doc's token OFFSET, so
    the audit every pipeline wants — how many sequences, how many docs get
    split across a boundary, how many boundary crossings, how much tail
    padding — reduces to a distributed prefix sum, never a sequential scan.

    Scale shape: the same two-level prefix sum as ``training_shards``
    (within-bucket window + broadcast per-lang bucket offsets) — the
    offsets relation is #buckets rows, so the one ordered structure the
    semantics require never serializes a lang onto one task. Everything
    else is map-side int arithmetic on (start, end) offsets.

    Output per lang: (lang, n_docs, total_tokens, n_seqs,
    n_straddle_docs, n_crossings, pad_tokens) where
    n_seqs = ceil(total/seq_len), a doc straddles when floor(start/L) !=
    floor((end-1)/L), crossings = floor((end-1)/L) - floor(start/L), and
    pad_tokens is the tail waste of the final partial sequence.
    """
    counted = scoped_cache(
        _docs(spark, sf_dir).select(
            F.col("doc_id").alias("stream_id"),
            "lang",
            F.size(tokens_col("text")).cast("long").alias("n_tokens"),
        ),
        "pack_sequences",
    )
    return pack_stats(counted, seq_len)


def pack_offsets(counted: DataFrame) -> DataFrame:
    """Per-row token START offsets for the concat-in-stream_id-order packing
    — the two-level distributed prefix sum (within-bucket window + broadcast
    per-lang bucket offsets) factored out so pack_stats (the audit) and
    pipeline/epoch.py:epoch_write (the materialized artifact) compute
    placement from ONE definition. Input: (stream_id, lang, n_tokens, ...);
    output: the same rows + a ``start`` column. The offsets relation is
    #buckets rows, so no lang ever serializes onto one task."""
    bucket_width = 4096
    counted = counted.withColumn(
        "bkt", F.floor(F.col("stream_id") / F.lit(bucket_width))
    )
    wb = (
        Window.partitionBy("lang", "bkt")
        .orderBy("stream_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_cum = F.coalesce(F.sum("n_tokens").over(wb), F.lit(0))
    bkt_tot = counted.groupBy("lang", "bkt").agg(F.sum("n_tokens").alias("tot"))
    wo = (
        Window.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bkt_tot.select(
        "lang", "bkt", F.coalesce(F.sum("tot").over(wo), F.lit(0)).alias("off")
    )
    return (
        counted.withColumn("_local_cum", local_cum)
        .join(F.broadcast(offsets), ["lang", "bkt"])
        .withColumn("start", F.col("_local_cum") + F.col("off"))
        .drop("_local_cum", "off", "bkt")
    )


def pack_stats(counted: DataFrame, seq_len: int) -> DataFrame:
    """The packing core over ANY (stream_id, lang, n_tokens) relation —
    stream_id is the monotone concatenation order within each lang (plain
    doc_id for pack_sequences; (doc_id, rep) flattened for epoch_build).
    Same two-level prefix sum and output schema as pack_sequences."""
    L = F.lit(seq_len)
    start = F.col("start")
    end = start + F.col("n_tokens")
    first_seq = F.floor(start / L)
    last_seq = F.floor((end - F.lit(1)) / L)
    nonempty = F.col("n_tokens") > 0
    per_doc = pack_offsets(counted).select(
        "lang",
        "n_tokens",
        F.when(nonempty & (first_seq != last_seq), F.lit(1))
        .otherwise(F.lit(0))
        .alias("straddle"),
        F.when(nonempty, last_seq - first_seq).otherwise(F.lit(0)).alias("crossings"),
    )
    total = F.sum("n_tokens")
    n_seqs = F.floor((total + L - F.lit(1)) / L)
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            total.cast("long").alias("total_tokens"),
            n_seqs.cast("long").alias("n_seqs"),
            F.sum("straddle").cast("long").alias("n_straddle_docs"),
            F.sum("crossings").cast("long").alias("n_crossings"),
            (n_seqs * L - total).cast("long").alias("pad_tokens"),
        )
        .orderBy("lang")
    )


# default mixture weights: base + (hash(source) % n) * step, in ppm —
# 0.5x / 1.25x / 2.0x / 2.75x. One set of constants shared by
# resample_emit's defaults, mixture_resample, epoch_build, and the gate
# oracles (which interpolate them) so no site can drift.
MIX_BASE_PPM, MIX_STEP_PPM, MIX_N_WEIGHTS = 500_000, 750_000, 4
# max copies any doc can emit under those weights: floor(max w) + 1
MIX_MAX_REPS = (MIX_BASE_PPM + (MIX_N_WEIGHTS - 1) * MIX_STEP_PPM) // 1_000_000 + 1
# per-doc stream-id slots in epoch_build (stream_id = doc_id*STRIDE + rep);
# must hold every rep index or stream ids collide across docs
EPOCH_STREAM_STRIDE = 4


def _mixture_w_ppm(base_ppm: int, step_ppm: int, n_weights: int):
    """The self-contained per-source weight both the emit and the audit's
    empty-source fallback derive — one expression so they can never drift."""
    return (
        F.lit(base_ppm)
        + (_hash48(F.col("source"), "mixw#") % F.lit(n_weights)) * F.lit(step_ppm)
    ).cast("long")


def resample_emit(
    docs: DataFrame,
    base_ppm: int = MIX_BASE_PPM,
    step_ppm: int = MIX_STEP_PPM,
    n_weights: int = MIX_N_WEIGHTS,
) -> DataFrame:
    """Deterministic fractional mixture resampling over any
    (doc_id, source, ...) relation — the epoch-construction op that turns a
    per-source weight (0.5x, 1.25x, 2x, ...) into an actual emitted-copy
    relation, the way LLM training recipes up-/down-sample sources into the
    final mixture. Each doc emits ``floor(w)`` copies plus one more iff its
    salted 48-bit hash falls below ``frac(w)`` of hash space — so a 1.25x
    source repeats every doc once and a deterministic quarter of docs
    twice, a 0.5x source keeps a deterministic half. Map-only (hash +
    array_repeat explode), reproducible at any partitioning, never
    ``rand()`` — a retried task re-emits the identical copies, which is
    what makes the op usable under speculative execution at 100 TB.

    The per-source weight is itself derived deterministically here
    (``base_ppm + (hash(source) % n_weights) * step_ppm``) so the gate is
    self-contained; a production caller would broadcast-join a real weight
    table instead — the emit shape is identical.

    Output: input columns + ``w_ppm`` + ``rep`` (0-based copy index, the
    column an epoch writer would salt shuffling/sharding by)."""
    M = 1_000_000
    w_ppm = _mixture_w_ppm(base_ppm, step_ppm, n_weights)
    f = _hash48(F.col("doc_id"), "mixf#") % F.lit(M)
    reps = (
        F.floor(F.col("w_ppm") / F.lit(M))
        + F.when(f < F.col("w_ppm") % F.lit(M), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    return (
        docs.withColumn("w_ppm", w_ppm)
        .withColumn("_reps", reps)
        .select(
            "*",
            F.posexplode(F.array_repeat(F.lit(1), F.col("_reps"))).alias("rep", "_one"),
        )
        .drop("_reps", "_one")
    )


def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate audit over ``resample_emit``: per source, the weight, input doc
    count, emitted copy count, and order-insensitive integer checksums of
    WHICH copies were emitted (id-sum and chars-sum over multiplicities) —
    exact on both engines. ``n_total`` comes from the pre-explode relation
    so 0-rep (downsampled) docs still count as input."""
    base_ppm, step_ppm, n_weights = MIX_BASE_PPM, MIX_STEP_PPM, MIX_N_WEIGHTS
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    totals = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    audit = (
        resample_emit(docs, base_ppm, step_ppm, n_weights)
        .groupBy("source")
        .agg(
            F.first("w_ppm").alias("w_ppm"),
            F.count("*").cast("long").alias("n_emitted"),
            F.sum("doc_id").cast("long").alias("emitted_id_sum"),
            F.sum("n_chars").cast("long").alias("emitted_chars"),
        )
    )
    return (
        totals.join(audit, "source", "left")
        .select(
            "source",
            # a source whose every doc downsampled away still reports its w
            F.coalesce(
                F.col("w_ppm"), _mixture_w_ppm(base_ppm, step_ppm, n_weights)
            ).alias("w_ppm"),
            "n_total",
            F.coalesce(F.col("n_emitted"), F.lit(0)).alias("n_emitted"),
            F.coalesce(F.col("emitted_id_sum"), F.lit(0)).alias("emitted_id_sum"),
            F.coalesce(F.col("emitted_chars"), F.lit(0)).alias("emitted_chars"),
        )
        .orderBy("source")
    )


def epoch_build(spark: SparkSession, sf_dir: str, seq_len: int = 2048) -> DataFrame:
    """The capstone COMPOSITION gate: exact-dedup survivors → mixture
    resampling → sequence packing, in one plan — the minimal end-to-end
    epoch construction a training pipeline runs nightly, proving the three
    operators compose (each is individually gated; this gate would flip if
    any interface drifted).

    Stream order: emitted copies concatenate per lang by (doc_id, rep),
    flattened to a monotone stream_id = doc_id*EPOCH_STREAM_STRIDE + rep —
    collision-free because the default weights cap reps at MIX_MAX_REPS,
    guarded below (and the oracle interpolates the same stride). Tokens are
    counted ONCE per surviving doc, before the copy explode. All three
    stages keep their individual scale shapes: dedup shuffles digests only,
    resampling is map-only, packing is the two-level prefix sum."""
    counted = scoped_cache(
        epoch_stream(spark, sf_dir).select("stream_id", "lang", "n_tokens"),
        "epoch_build",
    )
    return pack_stats(counted, seq_len)


def epoch_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch's document stream: exact-dedup survivors → mixture
    resampling, flattened to the monotone per-lang concatenation order
    stream_id = doc_id*EPOCH_STREAM_STRIDE + rep — collision-free because
    the default weights cap reps at MIX_MAX_REPS (guarded). ONE definition
    shared by epoch_build (the audit) and pipeline/epoch.py:epoch_write
    (the materialized artifact), so the two can never disagree about what
    the epoch contains. Tokens are counted ONCE per surviving doc, before
    the copy explode. Columns: (stream_id, doc_id, rep, source, lang,
    n_tokens)."""
    if MIX_MAX_REPS > EPOCH_STREAM_STRIDE:
        raise ValueError(
            f"mixture weights allow {MIX_MAX_REPS} copies per doc but the "
            f"epoch stream stride is {EPOCH_STREAM_STRIDE} — stream ids "
            "would collide across docs"
        )
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.col("text")).alias("digest"),
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("digest").orderBy("doc_id")
    survivors = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "digest")
    )
    emitted = resample_emit(survivors)
    return emitted.select(
        (F.col("doc_id") * F.lit(EPOCH_STREAM_STRIDE) + F.col("rep")).alias(
            "stream_id"
        ),
        "doc_id",
        "rep",
        "source",
        "lang",
        "n_tokens",
    )
