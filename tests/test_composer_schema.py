"""Numeric-lex term composer (MiruTermComposer analog) + versioned schema
(MiruSchema.checkAdditive analog)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_spark.functions.composer import (
    SEP,
    compose,
    decompose,
    int_to_lex,
    lex_to_int,
    lex_to_long,
    long_to_lex,
)
from miru_spark.schema import FieldDef, IndexSchema, check_additive

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)


@settings(max_examples=300)
@given(I64, I64)
def test_long_lex_order_preserving(a, b):
    assert (long_to_lex(a) < long_to_lex(b)) == (a < b)


@settings(max_examples=300)
@given(I64)
def test_long_lex_roundtrip(v):
    s = long_to_lex(v)
    assert len(s) == 16
    assert lex_to_long(s) == v


@settings(max_examples=200)
@given(I32, I32)
def test_int_lex_order_and_roundtrip(a, b):
    assert (int_to_lex(a) < int_to_lex(b)) == (a < b)
    assert lex_to_int(int_to_lex(a)) == a


def test_compose_decompose_roundtrip_and_order():
    parts = ["lang", long_to_lex(42)]
    t = compose(*parts)
    assert decompose(t) == parts
    # composite order: first by part 0, then part 1 (separator below
    # printable chars, the length-prefix invariant in string domain)
    assert compose("a", "zzz") < compose("ab", "a")
    assert compose("a", long_to_lex(-5)) < compose("a", long_to_lex(5))
    with pytest.raises(ValueError):
        compose("bad" + SEP + "part")


def test_lex_col_matches_python(spark):
    from pyspark.sql import functions as F

    from miru_spark.functions.composer import lex_long_col

    vals = [0, 1, -1, 200, 800, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["lex"] for r in df.select("v", lex_long_col(F.col("v")).alias("lex")).collect()}
    for v in vals:
        assert got[v] == long_to_lex(v), v


def _schema(fields):
    return IndexSchema("corpus", 1, [FieldDef(*f) for f in fields])


def test_additive_schema_rules():
    base = _schema([("repo", "string", "key"), ("content", "string", "content")])
    wider = _schema([("repo", "string", "key"), ("content", "string", "content"), ("ts", "bigint", "time")])
    check_additive(base, wider)  # appending is fine
    with pytest.raises(ValueError, match="not additive"):
        check_additive(wider, base)  # removal rejected
    retyped = _schema([("repo", "bigint", "key"), ("content", "string", "content")])
    with pytest.raises(ValueError, match="not additive"):
        check_additive(base, retyped)  # retype rejected
    reordered = _schema([("content", "string", "content"), ("repo", "string", "key")])
    with pytest.raises(ValueError, match="not additive"):
        check_additive(base, reordered)  # positions are part of the contract


def test_build_registers_and_guards_schema(spark, tiny_corpus, tmp_path):
    from miru_spark.index.build import build_index
    from miru_spark.schema import load_schema

    idx = str(tmp_path / "sidx")
    build_index(spark, tiny_corpus, idx, num_partitions=2)
    s = load_schema(idx)
    assert s is not None and [f.name for f in s.fields] == [
        "repo", "path", "commit", "lang", "content",
    ]
    # a rebuild that REMOVES a column must fail loudly
    with pytest.raises(ValueError, match="not additive"):
        build_index(spark, tiny_corpus.drop("lang"), idx, num_partitions=2)
    # an additive rebuild (new trailing column) upgrades the version
    from pyspark.sql import functions as F

    wider = tiny_corpus.withColumn("ts", F.lit(7).cast("long"))
    build_index(spark, wider, idx, num_partitions=2, resume=False)
    s2 = load_schema(idx)
    assert [f.name for f in s2.fields][-1] == "ts"
    assert s2.version == s.version + 1
