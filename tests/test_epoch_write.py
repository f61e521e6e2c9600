"""epoch_write — the materialized epoch artifact's resume contract.

Pins the r4-verdict 'Done' criteria: a killed run (crash injected in the
exact window the contract protects — after a shard's data file, before its
manifest) resumes without rewriting completed shards, and the finished
artifact's manifest-aggregated audit is value-identical to epoch_build's
audited composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from miru_spark.pipeline import epoch as E
from miru_spark.pipeline import text as T

SEQ_LEN = 512
SPS = 4  # tiny shards so sf0.001 produces many per lang


def _audit_rows(df):
    return [tuple(r) for r in df.collect()]


def test_kill_between_data_and_manifest_then_resume(spark, sf_dir, tmp_path):
    out = str(tmp_path / "epoch")
    # pick a real (lang, shard) to crash on — the LAST group to make it
    # likely other tasks completed first (any subset completing is fine)
    groups = (
        E.epoch_placement(spark, sf_dir, SEQ_LEN, SPS)
        .select("lang", "shard").distinct().orderBy("lang", "shard").collect()
    )
    assert len(groups) > 4, "need multiple shards for a meaningful kill test"
    victim = (groups[-1]["lang"], int(groups[-1]["shard"]))

    with pytest.raises(Exception, match="injected crash"):
        E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS,
                      _fail_shards=frozenset([victim]))

    man_dir = os.path.join(out, "manifests")
    done = sorted(os.listdir(man_dir))
    # the victim has data but NO manifest (the protected window)
    vic_man = f"{victim[0]}_{victim[1]:06d}.json"
    vic_data = os.path.join(out, "shards", f"{victim[0]}_{victim[1]:06d}.parquet")
    assert vic_man not in done
    assert os.path.exists(vic_data)
    # no top-level epoch.json either — the epoch is not complete
    assert not os.path.exists(os.path.join(out, "epoch.json"))

    # record completed shards' identity (mtime+size) before the rerun
    def stat_map():
        d = {}
        for name in os.listdir(os.path.join(out, "shards")):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(out, "shards", name))
                d[name] = (st.st_mtime_ns, st.st_size)
        return d

    before = {k: v for k, v in stat_map().items()
              if k.replace(".parquet", ".json") in done}

    summary = E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS)
    assert summary["skipped"] == len(done)
    assert summary["built"] == summary["n_shards"] - len(done)
    assert os.path.exists(os.path.join(out, "epoch.json"))
    # completed shards were NOT rewritten
    after = stat_map()
    for name, sig in before.items():
        assert after[name] == sig, f"completed shard {name} was rewritten"

    # the finished artifact's audit == the audited composition, exactly
    got = _audit_rows(E.epoch_audit(spark, out, SEQ_LEN))
    want = _audit_rows(T.epoch_build(spark, sf_dir, seq_len=SEQ_LEN))
    assert got == want


def test_placement_consistency_and_carry_in(spark, sf_dir, tmp_path):
    out = str(tmp_path / "epoch2")
    E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS)
    place = E.epoch_placement(spark, sf_dir, SEQ_LEN, SPS)

    # per-lang: offsets tile the stream exactly (sum of tokens == max end;
    # starts are the prefix sums of n_tokens in stream order)
    pdf = place.orderBy("lang", "stream_id").toPandas()
    for lang, g in pdf.groupby("lang"):
        starts = g["start"].to_numpy()
        toks = g["n_tokens"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == (starts[:-1] + toks[:-1])).all()
    # shard data files hold exactly the placement rows of their group
    import json

    man_dir = os.path.join(out, "manifests")
    total_rows = 0
    for name in sorted(os.listdir(man_dir)):
        with open(os.path.join(man_dir, name)) as f:
            m = json.load(f)
        if m["n_rows"] == 0:  # hole shard: no data file by contract
            assert m["data_file"] == ""
            continue
        rows = spark.read.parquet(m["data_file"])
        assert rows.count() == m["n_rows"]
        total_rows += m["n_rows"]
        # carry-in: the gap between the shard's token origin and its first
        # row is exactly the previous shard's spill (non-negative, < seq_len
        # * seqs_per_shard... and bounded by the longest doc)
        assert m["carry_in_tokens"] >= 0
        assert m["min_start"] == m["shard"] * SEQ_LEN * SPS + m["carry_in_tokens"]
    assert total_rows == len(pdf)

    # audit's n_seqs agrees with the placement's last sequence per lang
    audit = {r["lang"]: r for r in E.epoch_audit(spark, out, SEQ_LEN).collect()}
    last = (
        place.groupBy("lang").agg(F.max("last_seq").alias("mx")).collect()
    )
    for r in last:
        assert audit[r["lang"]]["n_seqs"] == r["mx"] + 1


def test_rerun_without_resume_rebuilds(spark, sf_dir, tmp_path):
    out = str(tmp_path / "epoch3")
    s1 = E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS)
    s2 = E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS, resume=False)
    assert s2["built"] == s1["n_shards"] and s2["skipped"] == 0


def _tiny_corpus(tmp_path):
    """3-doc corpus with one doc longer than a whole (seq_len=4, sps=2)
    shard. source='web' hashes to mixture weight exactly 2.0 — every doc
    emits exactly 2 copies, no fractional-hash dependence — so the stream
    is fully deterministic: 2+2+100+100+2+2 = 208 tokens, 26 shards of 8."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_tiny"
    d.mkdir()
    giant = " ".join(f"tok{i}" for i in range(100))
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "lang": ["en", "en", "en"],
            "source": ["web", "web", "web"],
            "text": ["alpha beta", giant, "gamma delta"],
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(d / "documents.parquet"))
    return str(d)


def test_whole_shard_doc_writes_hole_manifests(spark, tmp_path):
    """A doc spanning entire shards produces groups the groupBy never emits;
    the writer must fill those HOLES with n_rows=0 manifests (full-carry
    shards) so the manifest directory is gapless and the loader contract
    (shard S = shard S's rows + carry_in) holds for every shard."""
    import json

    sf = _tiny_corpus(tmp_path)
    out = str(tmp_path / "epoch_hole")
    s = E.epoch_write(spark, sf, out, seq_len=4, seqs_per_shard=2)

    man_dir = os.path.join(out, "manifests")
    mans = {}
    for name in os.listdir(man_dir):
        with open(os.path.join(man_dir, name)) as f:
            m = json.load(f)
        mans[m["shard"]] = m
    # gapless numbering, counted in the epoch summary
    assert sorted(mans) == list(range(max(mans) + 1))
    assert s["n_shards"] == len(mans) == 26
    holes = [m for m in mans.values() if m["n_rows"] == 0]
    assert len(holes) == 23  # giant doc's 2 copies cover 23 rowless shards
    for m in holes:
        assert m["data_file"] == "" and m["sum_tokens"] == 0
        assert 0 < m["carry_in_tokens"] <= 8
        assert m["min_start"] == m["shard"] * 8 + m["carry_in_tokens"]
    # the manifest-only audit still equals the audited composition exactly
    got = _audit_rows(E.epoch_audit(spark, out, 4))
    want = _audit_rows(T.epoch_build(spark, sf, seq_len=4))
    assert got == want
    # resume: hole manifests skip like real ones
    s2 = E.epoch_write(spark, sf, out, seq_len=4, seqs_per_shard=2)
    assert s2["skipped"] == s2["n_shards"] and s2["built"] == 0


def test_params_mismatch_raises(spark, sf_dir, tmp_path):
    """Reopening an epoch dir with different packing params must refuse
    rather than produce a mixed-parameter artifact."""
    out = str(tmp_path / "epoch_params")
    E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS)
    with pytest.raises(ValueError, match="refusing to mix"):
        E.epoch_write(spark, sf_dir, out, SEQ_LEN * 2, SPS)


def test_resume_checksum_rejects_stale_shard(spark, sf_dir, tmp_path):
    """The resume skip requires the content checksum to match, not just the
    row count — a shard whose recorded content no longer matches the
    recomputed placement (edited corpus, same doc count) must rebuild."""
    import json

    out = str(tmp_path / "epoch_chk")
    s1 = E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS)
    man_dir = os.path.join(out, "manifests")
    name = sorted(os.listdir(man_dir))[0]
    p = os.path.join(man_dir, name)
    with open(p) as f:
        m = json.load(f)
    m["checksum"] ^= 1
    with open(p, "w") as f:
        json.dump(m, f)
    s2 = E.epoch_write(spark, sf_dir, out, SEQ_LEN, SPS)
    assert s2["built"] == 1 and s2["skipped"] == s1["n_shards"] - 1
