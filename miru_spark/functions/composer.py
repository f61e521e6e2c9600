"""Numeric-lex term encoding + composite terms (MiruTermComposer analog).

miru composes multi-part terms as length-prefixed byte concatenations, with
`numeric` prefixes lex-marshalled (offset binary: flip the sign bit) so
BYTE order equals NUMERIC order — which is what makes numeric range queries
a dictionary range scan (miru-service/.../MiruTermComposer.java:35-145:
composeBytes, writePrefixBytes numeric int/long branches).

This engine's term dictionary is a string domain (parquet `term` column),
so the same construction lands in strings:

- ``long_to_lex`` / ``int_to_lex``: offset-binary value rendered as fixed-
  width lowercase hex — ``lex(a) < lex(b)  ⇔  a < b`` over the whole signed
  range, comparable by plain string ordering (Spark, DuckDB, pyarrow all
  agree on ASCII).
- ``compose``/``decompose``: parts joined with the unit separator \\x1f
  (strings-domain stand-in for miru's length-prefixed bytes; key invariant
  kept: a composite sorts first by part 0, then part 1, ... because the
  separator is below every printable character).
- Column twins (``lex_long_col``) build the identical encoding JVM-side —
  no UDF: XOR the sign bit, hex, lower, left-pad.

Range queries: [lo, hi] over a numeric field encoded in the dictionary is
``term >= prefix+lex(lo) AND term <= prefix+lex(hi)`` — the same pushdown
class as the engine's prefix expansion (scorer.expand_prefixes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"
_SIGN64 = 1 << 63
_SIGN32 = 1 << 31


def long_to_lex(v: int) -> str:
    """Signed 64-bit → 16-char hex, offset binary: order-preserving."""
    if not -_SIGN64 <= v < _SIGN64:
        raise ValueError(f"value out of int64 range: {v}")
    return format((v ^ _SIGN64) & ((1 << 64) - 1), "016x")


def lex_to_long(s: str) -> int:
    u = int(s, 16) ^ _SIGN64
    return u - (1 << 64) if u >= _SIGN64 else u


def int_to_lex(v: int) -> str:
    """Signed 32-bit → 8-char hex, offset binary."""
    if not -_SIGN32 <= v < _SIGN32:
        raise ValueError(f"value out of int32 range: {v}")
    return format((v ^ _SIGN32) & ((1 << 32) - 1), "08x")


def lex_to_int(s: str) -> int:
    u = int(s, 16) ^ _SIGN32
    return u - (1 << 32) if u >= _SIGN32 else u


def lex_long_col(col: Column) -> Column:
    """Column twin of long_to_lex — pure JVM expressions (no UDF):
    sign-bit XOR, hex, pad, lower."""
    return F.lower(F.lpad(F.hex(col.bitwiseXOR(F.lit(-_SIGN64))), 16, "0"))


def compose(*parts: str) -> str:
    """Composite term from parts (strings, already lex-encoded if numeric).
    Separator \\x1f < all printable chars ⇒ composite order = part order."""
    for p in parts:
        if SEP in p:
            raise ValueError("part contains the composite separator")
    return SEP.join(parts)


def decompose(term: str) -> list[str]:
    return term.split(SEP)


def compose_col(*cols: Column) -> Column:
    return F.concat_ws(SEP, *cols)
