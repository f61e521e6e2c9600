"""Locale-keyed analyzer registry (Q2): the TermAnalyzers analog.

The reference selects a Lucene analyzer per locale with optional stopwords
(miru-plugin/.../query/TermAnalyzers.java:43-126: ``findAnalyzer(locale,
useStopWords)`` walks ``xx_yy`` → ``xx`` → standard fallback; the standard
fallback WITH stopwords uses the English stop set,
TermAnalyzers.java:47-48). Index-side and query-side must use the SAME
analyzer — the Q2 parity requirement.

Spark-native form: tokenization stays the single frozen analyzer
(analyzer.py — lowercase, split ``[^a-z0-9_]+``, keep dups, drop empties;
byte-identical across Python/JVM/Arrow/DuckDB), and the per-locale
difference is a STOPWORD SET applied after it. We do not replicate
Lucene's per-language stemmers (a different word-normalization universe);
the registry carries the reference's locale→stop-set selection semantics,
with ``register_stopwords`` for additional languages.

The chosen analyzer is recorded in the index's ``analyzer.json`` at build
time and re-applied to query text at parse time (see index/build.py and
query/scorer.py) — a stopworded index never sees a stopword in a query.

All four tokenizer implementations stay in parity (tests/test_analyzer.py
style): ``tokens_col`` (JVM), ``tokenize_pandas``/``tokenize_one``
(Python), ``stop_mask_for_vocab`` (Arrow/numpy build path), and
``duckdb_tokens_sql`` (oracle).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from miru_spark import analyzer as base
from miru_spark.stopwords_en import EN_STOPWORDS
from miru_spark.stopwords_langs import DE_STOPWORDS, ES_STOPWORDS, FR_STOPWORDS


@dataclass(frozen=True)
class Analyzer:
    """A resolved analyzer: the frozen tokenizer + a stopword set."""

    locale: str
    use_stopwords: bool
    stopwords: frozenset = field(default_factory=frozenset)

    def tokens_col(self, content: Column | str) -> Column:
        c = base.tokens_col(content)
        if not self.stopwords:
            return c
        stop = F.lit(sorted(self.stopwords))
        # F.filter's 1-arg lambda (2-arg is the (element, index) form)
        return F.filter(c, lambda t: ~F.array_contains(stop, t))

    def tokenize_one(self, text: str) -> list[str]:
        toks = base.tokenize_one(text)
        if not self.stopwords:
            return toks
        return [t for t in toks if t not in self.stopwords]

    def tokenize_pandas(self, content: pd.Series) -> pd.Series:
        toks = base.tokenize_pandas(content)
        if not self.stopwords:
            return toks
        sw = self.stopwords
        return toks.map(lambda ts: [t for t in ts if t not in sw])

    def stop_mask_for_vocab(self, vocab: np.ndarray) -> np.ndarray:
        """Vectorized hook for the Arrow build path: True where vocab[i] is
        a stopword. The builder drops flagged token occurrences by masking
        ``codes`` — one isin over the (small) vocab, zero per-token Python."""
        if not self.stopwords:
            return np.zeros(len(vocab), dtype=bool)
        return np.isin(vocab, sorted(self.stopwords))

    def duckdb_tokens_sql(self, col: str = "content") -> str:
        inner = base.duckdb_tokens_sql(col)
        if not self.stopwords:
            return inner
        lst = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(self.stopwords))
        return f"list_filter({inner}, t -> NOT list_contains([{lst}], t))"

    def to_config(self) -> dict:
        return {"locale": self.locale, "use_stopwords": self.use_stopwords}


# locale → stop set when use_stopwords (TermAnalyzers.java:51-84 registers
# per-language Lucene analyzers; we register stop sets). en_ie shares the
# English set exactly as the reference passes ENGLISH_STOP_WORDS_SET to
# IrishAnalyzer (TermAnalyzers.java:57). de/es/fr carry the public Snowball
# lists (the Lucene per-language analyzer defaults the reference constructs
# at :60/:76/:61); more via register_stopwords.
_STOPWORD_SETS: dict[str, frozenset] = {
    "en": EN_STOPWORDS,
    "en_ie": EN_STOPWORDS,
    "de": DE_STOPWORDS,
    "es": ES_STOPWORDS,
    "fr": FR_STOPWORDS,
}


def register_stopwords(locale: str, words) -> None:
    _STOPWORD_SETS[locale] = frozenset(words)


def find_analyzer(locale: str | None, use_stopwords: bool) -> Analyzer:
    """The reference's fallback walk (TermAnalyzers.java:120-136): exact
    locale, then progressively strip ``_``-suffixes, then the standard
    fallback — which with stopwords uses the ENGLISH set (:47)."""
    if not use_stopwords:
        return Analyzer(locale or "", False)
    code = locale or ""
    while code:
        s = _STOPWORD_SETS.get(code)
        if s is not None:
            return Analyzer(locale, True, s)
        ix = code.rfind("_")
        if ix == -1:
            break
        code = code[:ix]
    return Analyzer(locale or "", True, EN_STOPWORDS)  # stopword standard fallback


DEFAULT = Analyzer("", False)


def from_config(cfg: dict | None) -> Analyzer:
    if not cfg:
        return DEFAULT
    return find_analyzer(cfg.get("locale"), bool(cfg.get("use_stopwords")))


def load(index_dir: str) -> Analyzer:
    """The index's analyzer, from ``analyzer.json`` (absent = the frozen
    default). Read by build_segments (streaming appends) and both query
    paths, so index- and query-side tokenization can never diverge."""
    import json
    import os

    p = os.path.join(index_dir, "analyzer.json")
    if not os.path.exists(p):
        return DEFAULT
    with open(p) as f:
        return from_config(json.load(f))


def save(index_dir: str, analyzer: Analyzer) -> None:
    import os

    from miru_spark.jsonio import save_json_atomic

    save_json_atomic(os.path.join(index_dir, "analyzer.json"), analyzer.to_config())
