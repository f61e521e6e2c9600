"""Porter stemmer (Porter 1980, "An algorithm for suffix stripping",
Program 14(3):130-137) — the full five-step suffix stripper the reference's
per-language Lucene analyzers apply for English (miru-plugin/.../query/
TermAnalyzers.java:51-84 constructs Lucene analyzers whose English default
chain ends in PorterStemFilter).

Implemented from the published paper, original rule tables (NOT the later
tartarus revisions that add ``(m>0) logi -> log`` and change ``abli``):
the original is the unambiguous published form and the parity contract
below only requires the implementations here to agree with EACH OTHER.

Where each implementation lives (the Q2 four-impl parity contract,
mirroring the S-stemmer in analyzers.py):
- Python per-word: ``porter_stem`` (this module) — the query side
  (parser._stem_terms via Analyzer.stem_one) and tests.
- Vocab-level build hook: ``Analyzer.stem_vocab`` maps the small UNIQUE
  dictionary through ``porter_stem`` once; the token stream is only touched
  by integer gathers (index/build.py:232-246) — so the index build's hot
  loop never runs per-token Python even with Porter enabled.
- DataFrame column: Porter's conditions (the measure m over VC runs, the
  context-dependent y-as-vowel rule) are NOT expressible in Spark Column
  algebra or RE2; ``Analyzer.tokens_col`` therefore uses an Arrow-batched
  pandas_udf running the SAME ``tokenize_pandas`` chain — parity by
  construction, and only the non-hot DataFrame path pays it.
- DuckDB oracle: inexpressible for the same reason (DuckDB's ``stem()``
  needs the non-installable fts extension; RE2 has no lookbehind for the
  y rule). Porter-analyzed gate entries are therefore ROWS-ONLY by design
  — the documented exception the driver contract allows; the value-level
  guarantee comes from tests/test_porter.py instead (the paper's own
  per-step vectors + end-to-end words + hypothesis parity).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    """Paper §2: a consonant is a letter other than a,e,i,o,u and other
    than y preceded by a consonant (so y at position 0 is a consonant)."""
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC){m}[V]: the number of V-run -> C-run transitions."""
    m = 0
    prev_vowel = False
    for i in range(len(w)):
        if _is_cons(w, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant where the final consonant
    is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            return w[:-1]
        return w
    fired = False
    if w.endswith("ed") and _has_vowel(w[:-2]):
        w, fired = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, fired = w[:-3], True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            return w + "e"
        if _ends_double_cons(w) and w[-1] not in "lsz":
            return w[:-1]
        if _measure(w) == 1 and _ends_cvc(w):
            return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


# Longest matching suffix is taken; if its m-condition fails on the stem,
# the step performs no action (the paper's "rational -> rational" example:
# 'ational' matches, m(r)=0, and the shorter 'tional' is NOT then tried).
_STEP2 = (
    ("ational", "ate"),
    ("ization", "ize"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("entli", "ent"),
    ("ousli", "ous"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("iviti", "ive"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("izer", "ize"),
    ("abli", "able"),
    ("alli", "al"),
    ("ator", "ate"),
    ("eli", "e"),
)

_STEP3 = (
    ("icate", "ic"),
    ("ative", ""),
    ("alize", "al"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ful", ""),
    ("ness", ""),
)

_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ion",  # extra condition: stem ends s or t
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "al",
    "er",
    "ic",
    "ou",
)


def _map_suffixes(w: str, table, min_m: int) -> str:
    for suf, rep in table:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > min_m - 1:
                return stem + rep
            return w
    return w


def _step2(w: str) -> str:
    return _map_suffixes(w, _STEP2, 1)


def _step3(w: str) -> str:
    return _map_suffixes(w, _STEP3, 1)


def _step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (suf != "ion" or stem.endswith(("s", "t"))):
                return stem
            return w
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        return w[:-1]
    return w


def porter_stem(w: str) -> str:
    """Stem one already-tokenized word (lowercase [a-z0-9_]+ from the frozen
    analyzer). Words of length <= 2 are returned unchanged (paper §3: the
    algorithm never acts on strings that short)."""
    if len(w) <= 2:
        return w
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _step2(w)
    w = _step3(w)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w
