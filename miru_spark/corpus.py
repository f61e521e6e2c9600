"""Deterministic synthetic source-code corpus + query fixtures (FIXTURES.md F1/F2).

Shape per BASELINE.json input_hint: (repo, path, commit, lang, content, sha256).
Generated distributed (one seeded RNG per Spark partition — no driver-side
materialization), so the same (seed, n_rows) pair yields the same multiset of
rows at any parallelism level. Content mixes head terms (>50% of docs, to
exercise salting), rare terms (df=1), repeated terms (TF>1), mixed case,
digits and unicode — mirroring the reference's randomized NG-test corpus
(miru-stream-plugins-test/.../fulltext/MiruFullTextNGTest.java:94-188) but
fully deterministic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANG_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}
LANGS = list(LANG_EXT)

# vocabulary tiers (all lowercase; tokenizer folds case so mixed-case
# emission below still lands on these)
HEAD_TERMS = ["def", "license", "return", "import", "the"]  # >50% of docs
COMMON_TERMS = [
    "class", "self", "value", "data", "index", "query", "merge", "sort",
    "hash", "table", "scan", "join", "filter", "group", "window", "batch",
    "stream", "spark", "column", "row", "key", "partition", "segment",
    "posting", "score", "term", "token", "doc", "count", "buffer",
]
MIXED_CASE = ["CamelCase", "snake_case", "HTTPServer", "parseJSON", "müller", "naïve"]
DIGIT_TERMS = ["x1", "v2", "2024", "int64", "utf8"]

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def _gen_rows(start: int, end: int, seed: int) -> pd.DataFrame:
    """Generate corpus rows [start, end); row i depends only on (seed, i)."""
    rows = []
    for i in range(start, end):
        rng = np.random.default_rng((seed << 32) ^ i)
        repo = f"org{i % 7}/repo{i % 23}"
        lang = LANGS[i % len(LANGS)]
        ext = LANG_EXT[lang]
        path = f"src/d{i % 13}/f{i}.{ext}"
        commit = hashlib.sha1(f"{seed}:{i // 50}".encode()).hexdigest()
        words: list[int | str] = []
        # head terms: each present with p=0.7, appended 1-3 times (TF>1)
        for t in HEAD_TERMS:
            if rng.random() < 0.7:
                words.extend([t] * int(rng.integers(1, 4)))
        n_common = int(rng.integers(5, 40))
        words.extend(rng.choice(COMMON_TERMS, size=n_common).tolist())
        if rng.random() < 0.2:
            words.append(str(rng.choice(MIXED_CASE)))
        if rng.random() < 0.3:
            words.append(str(rng.choice(DIGIT_TERMS)))
        # rare term: df == 1 across the corpus (unique per row)
        if i % 97 == 0:
            words.append(f"rareterm{i}")
        order = rng.permutation(len(words))
        content = " ".join(str(words[j]) for j in order)
        # punctuation separators to exercise the tokenizer split
        if i % 3 == 0:
            content = content.replace(" ", ", ", 1).replace(" ", "(", 2)
        rows.append((repo, path, commit, lang, content))
    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    df["sha256"] = [hashlib.sha256(c.encode()).hexdigest() for c in df["content"]]
    return df


def generate_corpus(
    spark: SparkSession, n_rows: int = 200, seed: int = 42, partitions: int = 2
) -> DataFrame:
    """Distributed deterministic corpus: ``spark.range`` → mapInPandas generator.

    Scale path: at 10^12 files this becomes the Iceberg table scan; the
    generator exists only so tests/bench need no external data.
    """
    rng_seed = seed

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield _gen_rows(int(ids.min()), int(ids.max()) + 1, rng_seed)

    base = spark.range(0, n_rows, 1, partitions)
    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


def verify_sha256(df: DataFrame) -> int:
    """Per-row invariant (BASELINE.json input_hint): recompute sha256(content)
    JVM-side and count mismatches. Returns the mismatch count (must be 0)."""
    return df.filter(F.sha2(F.col("content"), 256) != F.col("sha256")).count()


# ---------------------------------------------------------------- F2 queries
def reference_query_set() -> list[dict]:
    """The reference query set (FIXTURES.md F2): grammar subset that miru's
    LuceneBackedQueryParser maps to and/or/pButNotQ
    (miru-plugin/.../query/LuceneBackedQueryParser.java:76-144, default AND :51)."""
    qs = [
        dict(qid=1, query="rareterm0", lang_filter=None, repo_filter=None, k=10),
        dict(qid=2, query="def", lang_filter=None, repo_filter=None, k=10),
        dict(qid=3, query="merge AND sort", lang_filter=None, repo_filter=None, k=10),
        dict(qid=4, query="posting segment score", lang_filter=None, repo_filter=None, k=10),  # implicit AND
        dict(qid=5, query="merge OR sort", lang_filter=None, repo_filter=None, k=10),
        dict(qid=6, query="index AND NOT license", lang_filter=None, repo_filter=None, k=10),
        dict(qid=7, query="rare*", lang_filter=None, repo_filter=None, k=10),
        dict(qid=8, query="merge AND sort", lang_filter=["python", "go"], repo_filter=None, k=10),
        dict(qid=9, query="def", lang_filter=None, repo_filter=["org1/repo1"], k=10),
        dict(qid=10, query="zebra AND merge", lang_filter=None, repo_filter=None, k=10),  # absent term
        dict(qid=11, query="camelcase", lang_filter=None, repo_filter=None, k=10),  # case-folded
        dict(
            qid=12,
            query="merge AND sort AND hash AND join AND filter AND group AND window AND batch AND key AND row",
            lang_filter=None, repo_filter=None, k=10,
        ),  # 10-term conjunction like MiruFullTextNGTest.java:68
        dict(qid=13, query="int64 OR utf8 OR 2024", lang_filter=None, repo_filter=None, k=10),
        dict(qid=14, query="müller", lang_filter=None, repo_filter=None, k=10),
    ]
    return qs
