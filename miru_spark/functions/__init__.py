"""Scalar/codec function surface (SURVEY.md §2.8).

The engine's kernel functions, re-exported under one namespace:
tokenization (analyzer parity), posting codec, roaring bitmaps, and the
waveform delta codec (miru's Waveform.compress analog).
"""

from miru_spark.analyzer import (  # noqa: F401
    duckdb_tokens_sql,
    tokenize_arrow_flat,
    tokenize_one,
    tokenize_pandas,
    tokens_col,
)
from miru_spark.codec import (  # noqa: F401
    decode_block_meta,
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
)
from miru_spark.functions.waveform import compress_waveform, decompress_waveform  # noqa: F401
from miru_spark.roaring import (  # noqa: F401
    and_array,
    andnot_array,
    cardinality,
    contains,
    from_array,
    or_many,
    to_array,
)
