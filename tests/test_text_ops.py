"""stratified_split / ngram_repetition invariants beyond the value-hash gate."""

import pyspark.sql.functions as F


def _write_docs(spark, path, n=300, partitions=4):
    rows = [
        (i, f"tok{i % 7} tok{i % 3} tok{i % 7} tok{i % 7} tok{i % 3} tok{i % 5}", "en" if i % 2 else "de", "s", 40)
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(partitions).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_split_stable_across_partitionings(spark, tmp_path):
    """Membership is a pure function of doc_id: the per-group audit must be
    identical whether the table arrives in 1 file or 16 (a rand()-based
    split would differ run-to-run and retry-to-retry)."""
    from miru_spark.pipeline.text import stratified_split

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_docs(spark, a, partitions=1)
    _write_docs(spark, b, partitions=16)
    ra = [tuple(r) for r in stratified_split(spark, a).collect()]
    rb = [tuple(r) for r in stratified_split(spark, b).collect()]
    assert ra == rb
    # rough proportions: train is the large bucket in every lang
    per_lang = {}
    for lang, split, n_docs, _ in ra:
        per_lang.setdefault(lang, {})[split] = n_docs
    for lang, d in per_lang.items():
        assert d["train"] > d.get("val", 0) + d.get("test", 0), (lang, d)


def test_ngram_repetition_flags_repeats(spark, tmp_path):
    """A doc made of one repeated shingle scores ~1e6 ppm; an all-distinct
    doc scores 0 — and both land in the right threshold bucket."""
    from miru_spark.pipeline.text import ngram_repetition

    sf = str(tmp_path)
    rows = [
        (0, "a b c " * 20, "en", "s", 10),  # one shingle repeated
        (1, " ".join(f"w{i}" for i in range(30)), "en", "s", 10),  # all distinct
        (2, "x y", "en", "s", 3),  # fewer than 3 tokens -> 0 ppm
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = ngram_repetition(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    assert r["n_repetitive"] == 1  # only doc 0 crosses 20%
    # doc 0: 58 shingles, 3 distinct -> (58-3)/58 ≈ 948276 ppm
    assert 940000 < r["sum_rep_ppm"] < 960000


def test_quota_sample_prefilter_branch_is_exact(spark):
    """A skewed corpus (one source holding ~94% of rows) forces the
    big-source pre-filter branch; its output must equal the plain-window
    definition exactly — the pre-filter is an optimization, not a
    semantics change."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from miru_spark.pipeline.text import _hash48, quota_sample

    quota = 7
    rows = [(i, "hot" if i < 500 else f"cold{i % 4}", i % 97) for i in range(532)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = (
        quota_sample(df, quota)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
        .collect()
    )
    w = Window.partitionBy("source").orderBy("_h", "doc_id")
    exp = (
        df.withColumn("_h", _hash48(F.col("doc_id"), "quota#"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    # the hot source (500 rows > 4*quota) was pre-filtered yet kept its quota
    assert sum(1 for r in got if r["source"] == "hot") == quota


def test_span_dedup_flags_cross_doc_copies(spark, tmp_path):
    """Two docs sharing their full text have EVERY span duplicated
    (dup_ppm = 1e6, flagged); a unique long doc has none; docs shorter than
    the span width are excluded on both engines."""
    from miru_spark.pipeline.dedup import span_dedup_stats

    base = " ".join(f"w{i}" for i in range(40))  # 40 distinct tokens
    uniq = " ".join(f"u{i}" for i in range(40))
    rows = [
        (1, base, "en", "s", 10),
        (2, base, "en", "s", 10),  # exact copy -> every span dup in BOTH
        (3, uniq, "en", "s", 10),  # unique -> zero dup spans
        (4, "too short", "en", "s", 10),  # < 16 tokens -> no spans at all
    ]
    p = str(tmp_path / "d")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{p}/documents.parquet")

    out = span_dedup_stats(spark, p).collect()
    assert len(out) == 1
    r = out[0]
    # 40 tokens, w=16, stride=8 -> offsets 0,8,16,24 = 4 spans/doc; 3 docs
    assert r["n_docs"] == 3 and r["total_spans"] == 12
    assert r["total_dup_spans"] == 8  # docs 1+2 fully duplicated
    assert r["sum_dup_ppm"] == 2_000_000 and r["n_flagged"] == 2


def test_pack_sequences_hand_computed(spark, tmp_path):
    """seq_len=10 fixture small enough to pack by hand; doc_ids spread
    >4096 apart so every doc lands in its OWN prefix-sum bucket (the
    two-level offset join is exercised, not just the in-bucket window),
    and the result must be identical at 1 and 16 input partitions."""
    from miru_spark.pipeline.text import pack_sequences

    def toks(k, p="w"):
        return " ".join(f"{p}{i}" for i in range(k))

    # en stream in doc_id order: 4, 8, 12, 0 tokens -> offsets 0/4/12/24
    #   doc 4+8: crosses the 10-boundary once each; total 24 -> 3 seqs, pad 6
    # de: one 25-token doc -> spans seqs 0..2: 1 straddler, 2 crossings, pad 5
    rows = [
        (0, toks(4), "en", "s", 1),
        (5000, toks(8), "en", "s", 1),
        (10000, toks(12), "en", "s", 1),
        (15000, "", "en", "s", 1),  # empty doc: counts in n_docs only
        (2, toks(25, "d"), "de", "s", 1),
    ]
    for parts, sub in ((1, "a"), (16, "b")):
        p = str(tmp_path / sub)
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).repartition(parts).write.mode("overwrite").parquet(f"{p}/documents.parquet")
        out = {r["lang"]: tuple(r) for r in pack_sequences(spark, p, seq_len=10).collect()}
        assert out["en"] == ("en", 4, 24, 3, 2, 2, 6), out["en"]
        assert out["de"] == ("de", 1, 25, 3, 1, 2, 5), out["de"]


def test_resample_emit_deterministic_and_exact(spark):
    """Every doc emits floor(w) or floor(w)+1 copies with rep = 0..reps-1;
    the emitted relation is identical across partitionings and re-runs
    (retry/speculation safety); per-source emitted counts track w_ppm."""
    from miru_spark.pipeline.text import resample_emit

    rows = [(i, f"s{i % 3}", i % 11) for i in range(600)]
    df1 = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out1 = sorted(
        (r["source"], r["doc_id"], r["rep"], r["w_ppm"])
        for r in resample_emit(df1).collect()
    )
    out2 = sorted(
        (r["source"], r["doc_id"], r["rep"], r["w_ppm"])
        for r in resample_emit(df1.repartition(13)).collect()
    )
    assert out1 == out2 and out1 == sorted(set(out1))
    per_doc = {}
    w_of = {}
    for src, did, rep, w in out1:
        per_doc.setdefault((src, did), []).append(rep)
        w_of[src] = w
    for (src, did), reps in per_doc.items():
        w = w_of[src]
        assert reps == list(range(len(reps)))  # rep is a dense 0-based index
        assert len(reps) in (w // 1_000_000, w // 1_000_000 + 1)
    # emitted/total ratio tracks the weight (200 docs/source: loose bound)
    from collections import Counter

    emitted = Counter(src for src, _, _, _ in out1)
    for src, w in w_of.items():
        assert abs(emitted[src] / 200 - w / 1_000_000) < 0.15, (src, w, emitted[src])


def test_pack_sequences_random_vs_python_reference(spark, tmp_path):
    """Three seeded random corpora checked against an independent pure-
    Python packer (explicit offset walk, not the operator's prefix-sum
    algebra) — including the boundary-count identity: every one of the
    n_seqs-1 internal boundaries either falls inside a doc (counted in
    crossings) or exactly between docs."""
    import random

    from miru_spark.pipeline.text import pack_sequences

    L = 7
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = []
        for i in range(rng.randint(30, 60)):
            n = rng.choice([0, 1, 2, 3, 5, 8, 13, 20])
            rows.append(
                (i * 37, " ".join(f"w{j}" for j in range(n)),
                 rng.choice(["en", "de"]), "s", 1)
            )
        p = str(tmp_path / f"r{seed}")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).repartition(5).write.mode("overwrite").parquet(f"{p}/documents.parquet")

        # independent reference: walk offsets doc by doc, per lang
        exp = {}
        for lang in ("en", "de"):
            docs = sorted(
                (did, len(t.split()) if t else 0)
                for did, t, lg, _, _ in rows if lg == lang
            )
            off, straddle, crossings, total = 0, 0, 0, 0
            for _, n in docs:
                if n > 0:
                    first, last = off // L, (off + n - 1) // L
                    crossings += last - first
                    straddle += 1 if last != first else 0
                off += n
                total += n
            n_seqs = (total + L - 1) // L
            exp[lang] = (lang, len(docs), total, n_seqs, straddle, crossings,
                         n_seqs * L - total)
        got = {r["lang"]: tuple(r) for r in pack_sequences(spark, p, seq_len=L).collect()}
        assert got == {k: v for k, v in exp.items() if v[1] > 0}, (seed, got, exp)
        for lang, (_, _, total, n_seqs, _, crossings, _) in exp.items():
            if total == 0:
                continue
            # boundaries inside docs + boundaries at doc edges = n_seqs - 1
            assert 0 <= crossings <= max(n_seqs - 1, 0)


def test_epoch_build_drops_duplicates_before_resampling(spark, tmp_path):
    """An exact-duplicate doc must not contribute copies: epoch_build on
    (orig, dup, unique) equals epoch_build on (orig, unique) alone —
    regardless of the dup's source weight."""
    from miru_spark.pipeline.text import epoch_build

    text_a = " ".join(f"a{i}" for i in range(12))
    text_b = " ".join(f"b{i}" for i in range(9))
    with_dup = [
        (0, text_a, "en", "s0", 1),
        (7, text_a, "en", "s1", 1),  # exact dup, different source/weight
        (9, text_b, "en", "s2", 1),
    ]
    without = [with_dup[0], with_dup[2]]
    outs = []
    for rows, sub in ((with_dup, "a"), (without, "b")):
        p = str(tmp_path / sub)
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{p}/documents.parquet")
        outs.append([tuple(r) for r in epoch_build(spark, p, seq_len=10).collect()])
    assert outs[0] == outs[1] and outs[0][0][1] > 0  # n_docs (emitted copies) > 0
