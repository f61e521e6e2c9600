"""The analyzer: ONE tokenization, three byte-identical implementations.

miru does not tokenize at ingest — producers pre-tokenize; its intake
tokenizer lowercases and splits on a negated character class
(miru-stumptown-deployable/.../LogMill.java:79-93), and index/query-time
analyzers must match (miru-plugin/.../query/TermAnalyzers.java:43-126 —
the Q2 parity risk in SURVEY.md). We pin: lowercase → split on
``[^a-z0-9_]+`` → drop empties → KEEP duplicates (TF matters; miru keeps TF
via multiTermCardinality, miru-api/.../schema/MiruFieldDefinition.java:73).

Implementations (must agree; pinned by tests/test_analyzer.py):
- ``tokens_col``: JVM-side Catalyst expression (the hot path — whole-stage
  codegen, no Python).
- ``tokenize_pandas``: pandas/Arrow path used inside the segment builder.
- ``DUCKDB_TOKENS_SQL``: the DuckDB oracle expression.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

SPLIT_PATTERN = "[^a-z0-9_]+"
_RE = re.compile(SPLIT_PATTERN)

# Unicode parity pin: Python str.lower() FULL-maps U+0130 (İ) to "i" + a
# combining dot (U+0307), while Arrow utf8_lower / Spark lower / DuckDB
# lower() simple-map it to "i" — the only lowercase expansion in Unicode
# SpecialCasing. Without this, a query containing İ tokenizes differently
# from the index (the Q2 analyzer-parity failure mode, SURVEY.md §1.2).
_PRE_LOWER = {0x0130: "i"}


def tokens_col(content: Column | str) -> Column:
    """JVM-side tokens array (empties removed, duplicates kept). Spark's
    ``lower`` also full-maps U+0130 — pre-translate for cross-path parity."""
    c = F.col(content) if isinstance(content, str) else content
    c = F.translate(c, "İ", "i")
    return F.filter(F.split(F.lower(c), SPLIT_PATTERN), lambda t: t != F.lit(""))


def tokenize_pandas(content: pd.Series) -> pd.Series:
    """pandas path: Series[str] -> Series[list[str]]; identical semantics.
    (Per-row Python — kept for parity tests/oracles; the build hot path uses
    ``tokenize_arrow_flat``.)"""
    return content.str.translate(_PRE_LOWER).str.lower().str.split(_RE).map(
        lambda toks: [t for t in toks if t] if toks is not None else []
    )


def tokenize_arrow_flat(content: pd.Series):
    """Arrow-vectorized tokenizer for the build hot path — NO per-row Python
    (the input_hint requirement). Returns
    ``(codes int64, vocab object[], parents int64, n_tokens)`` where token i
    is ``vocab[codes[i]]`` belonging to input row ``parents[i]``. RE2 and
    Python `re` agree on this pattern (a plain negated character class).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(content.fillna(""), type=pa.large_string())
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), SPLIT_PATTERN)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parents = parents.filter(mask)
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype("int64")
    vocab = denc.dictionary.to_pandas().to_numpy(dtype=object)
    par = parents.to_numpy(zero_copy_only=False).astype("int64")
    return codes, vocab, par, codes.size


def tokenize_one(text: str) -> list[str]:
    return [t for t in _RE.split(text.translate(_PRE_LOWER).lower()) if t]


def duckdb_tokens_sql(col: str = "content") -> str:
    """DuckDB expression producing the identical token list."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '{SPLIT_PATTERN}'), t -> t <> '')"
    )
