"""BM25 top-k over the merged index: distributed DataFrame path + local path.

Replaces miru's TF-IDF scorer (miru-stream-plugins/.../fulltext/FullText.java:99-220,
multiplier = queryCount/collectionFrequency at :118-127, per-doc accumulation
:188-199, bounded top-k heap :129-132) with BM25 per the north rule:
``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)``,
``tf_norm = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))``, k1=1.2, b=0.75.
Tie order is miru's: (score desc, docID desc) (FullText.java:294-303).

Two execution paths, rank-identical by test:

- ``search_distributed``: the throughput path. Pure DataFrame program —
  postings for ONLY the query terms are read (parquet predicate pushdown on
  the term-range-partitioned merged index), decoded by a vectorized
  mapInPandas, joined to doc lengths, aggregated per doc, boolean-filtered
  by the query AST, ``orderBy(desc(score), desc(doc_id)).limit(k)``.
  Scales to any corpus: no driver materialization, Catalyst/AQE handle the
  joins; skew on head terms is bounded because merged rows are pre-sharded
  (merge.py salting).

- ``search_local``: the serving-latency path. pyarrow reads only the posting
  rows of the query terms; numpy set algebra evaluates the filter AST
  (AND = intersect, OR = union, pButNotQ = setdiff — the same bitmap algebra
  as miru's MiruBitmapsRoaring.java:162-436, on sorted int arrays instead of
  roaring containers); MaxScore term-level pruning skips whole terms that
  cannot reach the current kth score (the generalization of miru's
  `considerIfLastIdGreaterThanN` pruning, MiruAggregateUtil.java:1130,1181).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from miru_spark import roaring
from miru_spark.codec import decode_block_meta, decode_postings
from miru_spark.index import removal
from miru_spark.query import parser as qp

K1 = 1.2
B = 0.75
MAX_WILDCARD_EXPANSION = 1000  # miru's maxWildcardExpansion cap (MiruAggregateUtil.java:1158-1166)


def bm25_idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_tf_norm(tf, doc_len, avgdl):
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * doc_len / avgdl))


@dataclass
class IndexHandle:
    index_dir: str
    n_docs: int
    avgdl: float

    @classmethod
    def open(cls, index_dir: str) -> "IndexHandle":
        with open(os.path.join(index_dir, "corpus_stats.json")) as f:
            cs = json.load(f)
        return cls(index_dir, cs["n_docs"], cs["avgdl"])


def expand_prefixes(index_dir: str, prefix_set: set[str]) -> dict[str, list[str]]:
    """Prefix → matching dictionary terms (deterministic: term-sorted, capped).
    Uses the stats table (the term dictionary), pyarrow range pushdown."""
    out: dict[str, list[str]] = {}
    if not prefix_set:
        return out
    ds = _dataset(index_dir, "stats")
    for p in prefix_set:
        hi = p + "￿"
        t = ds.to_table(columns=["term"], filter=(pads.field("term") >= p) & (pads.field("term") < hi))
        terms = sorted(x for x in t.column("term").to_pylist() if x.startswith(p))
        out[p] = terms[:MAX_WILDCARD_EXPANSION]
    return out


# --------------------------------------------------------------------- local
# Serving caches (miru serves from an in-memory/mmapped LSM; our analog is
# caching the pyarrow dataset handles + the dense doc_len array). Keyed by
# the index generation = mtime of corpus_stats.json, which every
# merge/refresh rewrites LAST — so a re-merged index invalidates both caches.
_DATASET_CACHE: dict[tuple, pads.Dataset] = {}
_DOCLEN_CACHE: dict[tuple, np.ndarray] = {}
_DOCMETA_CACHE: dict[tuple, pd.DataFrame] = {}
_POSTING_CACHE: dict[tuple, tuple] = {}  # (dir, gen, term) → postings tuple
_POSTING_CACHE_MAX = 4096  # hot-term cache (miru's LAB block-cache analog)


def _index_generation(index_dir: str) -> float:
    try:
        return os.path.getmtime(os.path.join(index_dir, "corpus_stats.json"))
    except OSError:
        return -1.0


def _dataset(index_dir: str, part: str) -> pads.Dataset:
    """Cached pyarrow dataset (file discovery is a filesystem walk per call
    otherwise — measured as the bulk of warm-query latency)."""
    key = (index_dir, part, _index_generation(index_dir))
    ds = _DATASET_CACHE.get(key)
    if ds is None:
        ds = pads.dataset(os.path.join(index_dir, part))
        _DATASET_CACHE[key] = ds
    return ds


# Above this many ids the sparse filtered read stops paying (it touches
# min(|ids|, row groups) groups; a big spread set degenerates to the full
# scan plus filter overhead) — fall back to the dense cached array.
_SPARSE_IDS_MAX = 65536


class _SparseCol:
    """Driver-side docID → value map fetched with a row-group-pruned isin
    read — numpy-fancy-indexable like the dense array, but it touches only
    the row groups containing the requested ids. This is the first-query /
    rare-term serving shape at large N: the 100M-doc run measured the dense
    doc_len+meta materialization at minutes of wall for a 1-hit query."""

    def __init__(self, ids: np.ndarray, vals: np.ndarray):
        o = np.argsort(ids)
        self._ids = ids[o]
        self._vals = vals[o]

    def __getitem__(self, idx):
        # ids absent from the fetched universe must raise, not silently
        # return a neighbor's value (searchsorted alone would): verify the
        # hit vectorized, clamping the top-end insertion point first.
        if self._ids.size == 0:
            if np.asarray(idx).size == 0:
                return self._vals[np.zeros(0, dtype=np.int64)]
            raise KeyError(
                f"sparse doc_meta fetch is empty; requested "
                f"{np.atleast_1d(idx)[:3].tolist()}..."
            )
        i = np.minimum(np.searchsorted(self._ids, idx), self._ids.size - 1)
        if not np.all(self._ids[i] == idx):
            missing = np.asarray(idx)[np.asarray(self._ids[i] != idx)]
            raise KeyError(
                f"{missing.size if missing.ndim else 1} id(s) absent from the "
                f"sparse doc_meta fetch (e.g. {np.atleast_1d(missing)[:3].tolist()})"
            )
        return self._vals[i]


def _sparse_col(index_dir: str, column: str, ids: np.ndarray) -> _SparseCol:
    want = np.unique(np.asarray(ids, dtype=np.int64))
    t = _dataset(index_dir, "doc_meta").to_table(
        columns=["doc_id", column],
        filter=pads.field("doc_id").isin(want.tolist()),
    )
    got = np.asarray(t.column("doc_id"), dtype=np.int64)
    if got.size != want.size:
        raise ValueError(
            f"doc_meta is missing {want.size - got.size} of {want.size} ids"
        )
    return _SparseCol(got, np.asarray(t.column(column), dtype=np.int64))


def _doclens_for(index_dir: str, postings: dict, ast) -> "np.ndarray | _SparseCol":
    """Doc-length provider for one query: the cached dense array when it
    already exists (or must — termless-matchable shapes draw candidates
    from index masks, not postings), else a sparse fetch of the posting
    universe when it is small. Never populates the dense cache itself."""
    key = (index_dir, _index_generation(index_dir))
    if key in _DOCLEN_CACHE or qp.can_match_termless(ast):
        return _doclens(index_dir)
    sizes = sum(p[0].size for p in postings.values())
    if not postings or sizes > _SPARSE_IDS_MAX:
        return _doclens(index_dir)
    uni = np.unique(np.concatenate([p[0] for p in postings.values()]))
    return _sparse_col(index_dir, "doc_len", uni)


def _docts_for(index_dir: str, cand: np.ndarray) -> "np.ndarray | _SparseCol":
    """Doc-time provider for a KNOWN candidate set: dense cache if present,
    sparse row-group-pruned fetch when the set is small."""
    key = (index_dir, "ts", _index_generation(index_dir))
    if key in _DOCLEN_CACHE or cand.size > _SPARSE_IDS_MAX:
        return _docts(index_dir)
    ds = _dataset(index_dir, "doc_meta")
    if "ts" not in ds.schema.names:
        raise ValueError("index has no doc-time column (built without ts)")
    return _sparse_col(index_dir, "ts", cand)


def _doclens(index_dir: str) -> np.ndarray:
    """Dense docID → doc_len array. Driver-side cache — fine for the serving
    path at partition scale; the distributed path joins instead."""
    key = (index_dir, _index_generation(index_dir))
    arr = _DOCLEN_CACHE.get(key)
    if arr is None:
        t = _dataset(index_dir, "doc_meta").to_table(columns=["doc_id", "doc_len"])
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        lens = np.asarray(t.column("doc_len"), dtype=np.int64)
        arr = np.zeros(int(ids.max()) + 1, dtype=np.int64)
        arr[ids] = lens
        _DOCLEN_CACHE[key] = arr
    return arr


def _docts(index_dir: str) -> np.ndarray:
    """Dense docID → event-time array (S4 doc-time index, the serving analog
    of miru's MiruTimeIndex.java:15-56 / LabTimeIndex.java:139-150). Raises
    if the index was built without a ts column."""
    key = (index_dir, "ts", _index_generation(index_dir))
    arr = _DOCLEN_CACHE.get(key)
    if arr is None:
        ds = _dataset(index_dir, "doc_meta")
        if "ts" not in ds.schema.names:
            raise ValueError("index has no doc-time column (built without ts)")
        t = ds.to_table(columns=["doc_id", "ts"])
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts"), dtype=np.int64)
        arr = np.zeros(int(ids.max()) + 1, dtype=np.int64)
        arr[ids] = ts
        _DOCLEN_CACHE[key] = arr
    return arr


def _all_doc_ids(index_dir: str) -> np.ndarray:
    """Sorted full index mask (every doc_id) — ONE int64 column read, not
    the 5-column _docmeta table (at 100M docs the string columns are ~10x
    the bytes and would be pinned in cache just to extract ids)."""
    key = (index_dir, "all_ids", _index_generation(index_dir))
    arr = _DOCLEN_CACHE.get(key)
    if arr is None:
        t = _dataset(index_dir, "doc_meta").to_table(columns=["doc_id"])
        arr = np.sort(np.asarray(t.column("doc_id"), dtype=np.int64))
        _DOCLEN_CACHE[key] = arr
    return arr


def _docmeta(index_dir: str) -> pd.DataFrame:
    """Cached gather source (doc_id, repo, path, commit, lang) — the serving
    analog of miru's in-memory activity index; the distributed path joins the
    parquet instead (no driver materialization)."""
    key = (index_dir, _index_generation(index_dir))
    meta = _DOCMETA_CACHE.get(key)
    if meta is None:
        meta = (
            _dataset(index_dir, "doc_meta")
            .to_table(columns=["doc_id", "repo", "path", "commit", "lang"])
            .to_pandas()
        )
        _DOCMETA_CACHE[key] = meta
    return meta


def _docmeta_for(index_dir: str, ids: np.ndarray) -> pd.DataFrame:
    """Gather source for a KNOWN id set: the cached full table when one
    exists, else row-group-pruned isin reads of just those ids — NEVER a
    dense materialization (at 100M docs that is a multi-GB table; this
    runs inside executor Python workers via _gather_display_fields, where
    a dense fallback would pin that table once per worker). Large id sets
    are read in chunks so the isin value list stays bounded."""
    key = (index_dir, _index_generation(index_dir))
    if key in _DOCMETA_CACHE:
        return _docmeta(index_dir)
    cols = ["doc_id", "repo", "path", "commit", "lang"]
    ds = _dataset(index_dir, "doc_meta")
    uids = np.unique(np.asarray(ids, dtype=np.int64))
    chunk = 100_000
    parts = [
        ds.to_table(
            columns=cols, filter=pads.field("doc_id").isin(uids[i : i + chunk].tolist())
        ).to_pandas()
        for i in range(0, uids.size, chunk)
    ]
    if not parts:
        # typed empty frame, no scan: even an isin([]) read walks row-group
        # stats across every doc_meta file
        return pd.DataFrame(
            {c: pd.Series(dtype="int64" if c == "doc_id" else "object") for c in cols}
        )
    return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)


def _gather_display_fields(top: DataFrame, index_dir: str) -> DataFrame:
    """Attach stored display fields (repo/path/commit/lang) to a top-k
    result AFTER the limit (miru's lazy Promise gather, FullText.java:
    204-218, applied to the distributed paths).

    Before round 4 the distributed scorers joined the full doc_meta into
    the posting-hits relation, so four string columns crossed the scoring
    join and the per-doc aggregation's exchange — at 100M docs, the widest
    shuffle in the plan — to survive in only k rows. Here the scoring plan
    carries nothing but doc_id/score (plus AST-referenced filter fields)
    and the k surviving rows gather their fields via the same row-group-
    pruned doc_meta read the serving path uses (`_docmeta_for`): executor-
    side mapInPandas, no exchange, touches only the row groups covering
    the k ids (0.3 s for 512 of 1.04M rows at 100M docs, BENCH_100M_Q2)."""
    names = [f.name for f in top.schema.fields] + ["repo", "path", "commit", "lang"]
    out_schema = T.StructType(
        list(top.schema.fields)
        + [T.StructField(c, T.StringType()) for c in ("repo", "path", "commit", "lang")]
    )

    def gather(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = _docmeta_for(index_dir, pdf["doc_id"].to_numpy())
            yield pdf.merge(m, on="doc_id", how="left")[names]

    return top.mapInPandas(gather, schema=out_schema)


def load_postings(
    index_dir: str, terms: set[str]
) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """term → (sorted docIDs, tfs, block_last, block_max_tf); shards
    concatenated in shard order (contiguous docID ranges by construction, so
    block metadata concatenates monotonically too)."""
    if not terms:
        return {}
    gen = _index_generation(index_dir)
    out: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {}
    missing = set()
    for term in terms:
        key = (index_dir, gen, term)
        hit = _POSTING_CACHE.get(key)
        if hit is not None:
            _POSTING_CACHE[key] = _POSTING_CACHE.pop(key)  # LRU move-to-end
            out[term] = hit
        else:
            missing.add(term)
    if not missing:
        return out
    ds = _dataset(index_dir, "merged")

    def _load_one(term: str):
        # per-term scan: row-group stats prune to this term's groups; Arrow
        # reads + decompression release the GIL, so terms load concurrently
        t = ds.to_table(
            columns=["shard", "docids", "tfs", "block_last", "block_max_tf"],
            filter=pads.field("term") == term,
        )
        grp = t.to_pandas().sort_values("shard")
        ds_, tf_, bl_, bm_ = [], [], [], []
        for db, tb, blb, bmb in zip(grp["docids"], grp["tfs"], grp["block_last"], grp["block_max_tf"]):
            d, tf = decode_postings(db, tb)
            bl, bm = decode_block_meta(blb, bmb)
            ds_.append(d)
            tf_.append(tf)
            bl_.append(bl)
            bm_.append(bm)
        if not ds_:
            return term, None
        return term, (
            np.concatenate(ds_),
            np.concatenate(tf_),
            np.concatenate(bl_),
            np.concatenate(bm_),
        )

    if len(missing) == 1:
        results = [_load_one(next(iter(missing)))]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(missing))) as ex:
            results = list(ex.map(_load_one, sorted(missing)))
    for term, entry in results:
        if entry is None:
            continue
        out[term] = entry
        if len(_POSTING_CACHE) >= _POSTING_CACHE_MAX:
            # sweep entries from other index generations first (a refreshed
            # index must keep earning cache hits), then LRU-evict (dicts
            # iterate in insertion order; hits re-insert at the tail)
            stale = [k for k in _POSTING_CACHE if (k[0], k[1]) != (index_dir, gen)]
            for k in stale[: max(1, len(stale))]:
                del _POSTING_CACHE[k]
            while len(_POSTING_CACHE) >= _POSTING_CACHE_MAX:
                del _POSTING_CACHE[next(iter(_POSTING_CACHE))]
        _POSTING_CACHE[(index_dir, gen, term)] = entry
    return out


def load_filter_bitmap(index_dir: str, field: str, values: list[str]) -> bytes:
    """Roaring OR of the selected values' filter bitmaps (miru's
    getCompositeAuthz pattern, miru-plugin/.../index/MiruAuthzIndex.java:13),
    done container-level in miru_spark.roaring."""
    ds = _dataset(index_dir, "filters")
    t = ds.to_table(filter=(pads.field("field") == field) & (pads.field("value").isin(values)))
    return roaring.or_many([b.as_py() for b in t.column("doc_ids")])


def load_filter_set(index_dir: str, field: str, values: list[str]) -> np.ndarray:
    """Decoded docID array of the composite filter (test/debug convenience)."""
    return roaring.to_array(load_filter_bitmap(index_dir, field, values))


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED unique arrays via binary search into the
    larger — O(|small|·log|big|); np.intersect1d re-sorts the concatenation
    (measured 2x slower on multi-million-posting conjunctions)."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return a
    pos = np.searchsorted(b, a)
    pos_c = np.minimum(pos, b.size - 1)
    return a[(pos < b.size) & (b[pos_c] == a)]


def _setdiff_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a \\ b for sorted unique arrays, same binary-search trick."""
    if a.size == 0 or b.size == 0:
        return a
    pos = np.searchsorted(b, a)
    pos_c = np.minimum(pos, b.size - 1)
    return a[~((pos < b.size) & (b[pos_c] == a))]


def _eval_ast(node, postings, expansions, index_dir=None) -> np.ndarray:
    if isinstance(node, qp.Term):
        return postings.get(node.term, (np.empty(0, dtype=np.int64),))[0]
    if isinstance(node, qp.All):
        # full index mask (buildIndexMask, MiruBitmapsRoaring.java:457-505);
        # removal/time masks compose on top in search_local as usual
        return _all_doc_ids(index_dir)
    if isinstance(node, qp.Field):
        # field filter clause → its roaring bitmap, decoded as a doc set
        return load_filter_set(index_dir, node.field, [node.value])
    if isinstance(node, qp.Range):
        # ts:[lo TO hi] → doc-time mask as a doc set (buildTimeRangeMask,
        # MiruBitmapsRoaring.java:506-521); composes under AND/OR/NOT/XOR
        ts = _docts(index_dir)
        return np.nonzero((ts >= node.lo) & (ts <= node.hi))[0].astype(np.int64)
    if isinstance(node, qp.Prefix):
        sets = [postings[t][0] for t in expansions.get(node.prefix, []) if t in postings]
        if not sets:
            return np.empty(0, dtype=np.int64)
        out = sets[0]
        for s in sets[1:]:
            out = np.union1d(out, s)
        return out
    if isinstance(node, qp.And):
        sets = sorted((_eval_ast(c, postings, expansions, index_dir) for c in node.children), key=len)
        out = sets[0]
        for s in sets[1:]:
            if out.size == 0:
                return out  # abort-if-empty short circuit (MiruAggregateUtil.java:1143)
            out = _intersect_sorted(out, s)
        return out
    if isinstance(node, qp.Or):
        out = np.empty(0, dtype=np.int64)
        for c in node.children:
            out = np.union1d(out, _eval_ast(c, postings, expansions, index_dir))
        return out
    if isinstance(node, qp.Not):
        pos = _eval_ast(node.positive, postings, expansions, index_dir)
        neg = _eval_ast(node.negative, postings, expansions, index_dir)
        return _setdiff_sorted(pos, neg)
    if isinstance(node, qp.Xor):
        # n-ary xor = docs in an ODD number of children (2-ary: setxor1d);
        # miru MiruFilterOperation.java:16
        sets = [_eval_ast(c, postings, expansions, index_dir) for c in node.children]
        if len(sets) == 2:
            return np.setxor1d(sets[0], sets[1], assume_unique=True)
        allv = np.concatenate(sets) if sets else np.empty(0, dtype=np.int64)
        ids, counts = np.unique(allv, return_counts=True)
        return ids[counts % 2 == 1]
    raise TypeError(type(node))


def _score_candidates(cand, scoring_terms, postings, doclens, n_docs, avgdl):
    """Exact BM25 over the candidate vector. Per-term contribution vectors
    are computed concurrently (numpy releases the GIL), then ACCUMULATED in
    sorted term order — float sums stay bit-reproducible and rank-identical
    to the sequential oracle."""
    scores = np.zeros(cand.size, dtype=np.float64)
    dl = doclens[cand].astype(np.float64)
    terms = [t for t in sorted(scoring_terms) if t in postings]

    def _contrib(term):
        d, tf = postings[term][:2]
        pos = np.searchsorted(d, cand)
        pos_c = np.minimum(pos, d.size - 1)
        mask = (pos < d.size) & (d[pos_c] == cand)
        if not mask.any():
            return None
        idf = bm25_idf(float(d.size), n_docs)
        return mask, idf * bm25_tf_norm(tf[pos_c[mask]].astype(np.float64), dl[mask], avgdl)

    if len(terms) > 2 and cand.size > 100_000:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(terms))) as ex:
            parts = list(ex.map(_contrib, terms))
    else:
        parts = [_contrib(t) for t in terms]
    for part in parts:  # sorted-term order preserved by map()
        if part is not None:
            mask, vals = part
            scores[mask] += vals
    return scores


def _tf_upper(tf):
    """BM25 tf-norm upper bound: doc_len→0 maximizes tf*(k1+1)/(tf+k1*(1-b))."""
    tf = np.asarray(tf, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B))


def _blockmax_wand_candidates(
    scoring_terms, postings, k, n_docs, doclens, avgdl, diag=None, removed=None
):
    """Block-max WAND candidate generation for pure disjunctions (vectorized).

    Two pruning levels, both sound (every dropped doc provably scores < the
    kth-best total):

    1. **MaxScore term split**: θ = the exact kth single-term score of the
       strongest term (a lower bound on the final kth-best total, since BM25
       contributions are >= 0). Terms are sorted by global upper bound
       ``idf · tf_norm_ub(max_tf)``; docs appearing ONLY in non-essential
       terms (prefix whose cumulative UB < θ) can never reach θ.
    2. **Per-block max-score skipping** (the block-max step, per the north
       rule; generalizes miru's `considerIfLastIdGreaterThanN` recency skip,
       miru-plugin/.../solution/MiruAggregateUtil.java:1130,1181): for every
       surviving candidate, its score upper bound is Σ_t UB(block of t
       containing d), with UB(block) = idf_t · tf_norm_ub(block_max_tf).
       Candidates whose block-UB sum < θ are skipped before exact scoring.
       Docs past a term's last block or absent from a block contribute at
       most the block UB (>= their true contribution, possibly 0) — sound.

    Classic document-at-a-time WAND advances one pivot per step (per-row
    Python — banned here); this formulation does the same block-UB skipping
    as array passes: one searchsorted per term over the candidate vector.
    """
    ubs = {}
    for t in scoring_terms:
        if t not in postings:
            continue
        d, tf = postings[t][:2]
        ubs[t] = bm25_idf(float(d.size), n_docs) * float(_tf_upper(float(tf.max())))
    if not ubs:
        return np.empty(0, dtype=np.int64)
    order = sorted(ubs, key=lambda t: -ubs[t])
    # θ = exact kth single-term score of the strongest term that HAS > k
    # postings (rare terms have the highest idf/UB but can't seed a kth bound)
    theta = 0.0
    for t in order:
        d0, tf0 = postings[t][:2]
        if removed is not None and removed.size:
            # θ must lower-bound the kth best among ELIGIBLE docs: seeding it
            # from removed docs' scores could prune a valid candidate. idf
            # still uses the stored df (removal doesn't rewrite statistics —
            # miru's mask-only semantics).
            keep_m = ~np.isin(d0, removed, assume_unique=True)
            d0, tf0 = d0[keep_m], tf0[keep_m]
        if d0.size > k:
            s = bm25_idf(float(postings[t][0].size), n_docs) * bm25_tf_norm(
                tf0.astype(np.float64), doclens[d0].astype(np.float64), avgdl
            )
            theta = float(np.partition(s, s.size - k)[s.size - k])
            break
    essential, acc = [], 0.0
    for t in reversed(order):  # ascending ub
        acc += ubs[t]
        if theta <= 0.0 or acc >= theta:  # >= : a doc reaching exactly theta can tie in
            essential.append(t)
    sets = [postings[t][0] for t in essential]
    cand = sets[0]
    for s_ in sets[1:]:
        cand = np.union1d(cand, s_)
    if diag is not None:
        diag["union_size"] = int(cand.size)
        diag["essential_terms"] = len(essential)
        diag["theta"] = theta
    if theta <= 0.0 or cand.size == 0:
        return cand

    # block-max skipping: per-candidate UB = Σ_t UB of the containing block
    ub_sum = np.zeros(cand.size, dtype=np.float64)
    for t in order:
        d, tf, block_last, block_max_tf = postings[t]
        idf = bm25_idf(float(d.size), n_docs)
        block_ub = idf * _tf_upper(block_max_tf)
        pos = np.searchsorted(block_last, cand)  # containing-block index
        valid = pos < block_last.size  # past the last block → term contributes 0
        ub_sum[valid] += block_ub[pos[valid]]
    keep = ub_sum >= theta - 1e-12
    if diag is not None:
        diag["after_blockmax"] = int(np.count_nonzero(keep))
    return cand[keep]


def search_local(
    index_dir: str,
    query: str,
    k: int = 10,
    lang_filter: list[str] | None = None,
    repo_filter: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
    gather: bool = True,
    diag: dict | None = None,
) -> pd.DataFrame:
    """Serving path: parse → numpy set algebra → block-max WAND → BM25 top-k
    → gather. Pass ``diag={}`` to capture pruning statistics.

    Masks (ANDNOT/AND into the candidate set, never into the statistics —
    miru's buildIndexMask / buildTimeRangeMask composition,
    MiruBitmapsRoaring.java:457-521, FullTextCustomQuestion.java:109-111):
    removal bitmap always; ``time_range=(lo, hi)`` inclusive doc-time mask
    when the index carries a ts column."""
    h = IndexHandle.open(index_dir)
    from miru_spark import analyzers as anz

    ast = qp.parse_query(query, analyzer=anz.load(index_dir))
    expansions = expand_prefixes(index_dir, qp.prefixes(ast))
    needed = qp.all_terms(ast) | {t for ts in expansions.values() for t in ts}
    postings = load_postings(index_dir, needed)

    scoring_terms = qp.positive_terms(ast) | {
        t for p in qp.positive_prefixes(ast) for t in expansions.get(p, [])
    }
    pure_or = isinstance(ast, (qp.Term, qp.Or)) and all(
        isinstance(c, qp.Term) for c in getattr(ast, "children", ())
    )
    doclens = _doclens_for(index_dir, postings, ast)
    removed = removal.removed_array(index_dir)
    # WAND θ is seeded from unfiltered single-term scores, so ANY candidate
    # mask that θ doesn't account for (lang/repo/time) makes pruning unsound
    # — eligible docs could all score below the unfiltered kth best. Removal
    # is the one mask θ DOES account for (seeding skips removed docs).
    if (
        pure_or
        and not lang_filter
        and not repo_filter
        and time_range is None
        and len(scoring_terms) > 1
    ):
        cand = _blockmax_wand_candidates(
            scoring_terms, postings, k, h.n_docs, doclens, h.avgdl, diag=diag,
            removed=removed,
        )
    else:
        cand = _eval_ast(ast, postings, expansions, index_dir)
    if diag is not None:
        diag["scored"] = int(cand.size)
    if removed.size:
        cand = _setdiff_sorted(cand, removed)
    if time_range is not None:
        ts = _docts_for(index_dir, cand)
        cand = cand[(ts[cand] >= time_range[0]) & (ts[cand] <= time_range[1])]
    if lang_filter:  # roaring AND into the candidate set (container-skipping)
        cand = roaring.and_array(load_filter_bitmap(index_dir, "lang", lang_filter), cand)
    if repo_filter:
        cand = roaring.and_array(load_filter_bitmap(index_dir, "repo", repo_filter), cand)
    if cand.size == 0:
        return pd.DataFrame(columns=["doc_id", "score", "repo", "path", "commit", "lang"])

    scores = _score_candidates(cand, scoring_terms, postings, doclens, h.n_docs, h.avgdl)
    kk = min(k, cand.size)
    order = np.lexsort((cand, scores))[::-1][:kk]  # (score desc, docID desc)
    top = pd.DataFrame({"doc_id": cand[order], "score": scores[order]})
    if gather:  # lazy gather of stored fields (miru's Promise gather, FullText.java:204-218)
        meta = _docmeta_for(index_dir, top["doc_id"].to_numpy())
        top = top.merge(meta, on="doc_id", how="left")
    return top.reset_index(drop=True)


# --------------------------------------------------------------- distributed
_POSTING_ROW_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.IntegerType()),
    ]
)


def _ast_to_condition(node, expansions, term_bits=None) -> F.Column:
    """AST → boolean Column over the per-doc matched-terms aggregate.

    Two physical encodings of "which of the query's terms this doc matched":

    - ``term_bits=None``: a string-set column `mts` (collect_set agg state) —
      the general form, used when a query set needs more than 63 distinct
      terms.
    - ``term_bits={term: bit_index}``: ONE long column `mbits` (bit_or agg
      state). Term membership is a bitwise AND against a literal mask. This
      is the common serving case (≤63 distinct terms across the query/batch)
      and shrinks the per-group aggregation state crossing the plan's widest
      exchange from an array of strings to 8 bytes.

    Evaluating the SAME condition over a row whose `mts` is the empty array
    (or `mbits` = 0) yields the query's termless-match predicate — the
    doc_meta candidate branch reuses this directly (see search_distributed)."""
    if isinstance(node, qp.Term):
        if term_bits is not None:
            return F.col("mbits").bitwiseAND(F.lit(1 << term_bits[node.term])) != 0
        return F.array_contains("mts", node.term)
    if isinstance(node, qp.All):
        return F.lit(True)
    if isinstance(node, qp.Field):
        return F.col(node.field) == node.value  # doc_meta column carried through the agg
    if isinstance(node, qp.Range):
        return F.col(node.field).between(node.lo, node.hi)  # ts carried when present
    if isinstance(node, qp.Prefix):
        terms = expansions.get(node.prefix, [])
        if not terms:
            return F.lit(False)
        if term_bits is not None:
            mask = 0
            for t in terms:
                mask |= 1 << term_bits[t]
            return F.col("mbits").bitwiseAND(F.lit(mask)) != 0
        return F.arrays_overlap("mts", F.array(*[F.lit(t) for t in terms]))
    if isinstance(node, qp.And):
        out = F.lit(True)
        for c in node.children:
            out = out & _ast_to_condition(c, expansions, term_bits)
        return out
    if isinstance(node, qp.Or):
        out = F.lit(False)
        for c in node.children:
            out = out | _ast_to_condition(c, expansions, term_bits)
        return out
    if isinstance(node, qp.Not):
        return _ast_to_condition(node.positive, expansions, term_bits) & ~_ast_to_condition(
            node.negative, expansions, term_bits
        )
    if isinstance(node, qp.Xor):
        # odd-membership count — xor as modular arithmetic over child matches
        total = sum(
            F.when(_ast_to_condition(c, expansions, term_bits), 1).otherwise(0)
            for c in node.children
        )
        return total % 2 == 1
    raise TypeError(type(node))


_BITMASK_MAX_TERMS = 63  # bits 0..62 of a signed long; beyond → collect_set


def _term_bit_column(term_bits: dict[str, int]) -> F.Column:
    """term → its bit as a single flat CASE (one condition per term, no
    nesting — linear plan size, see CLAUDE.md on when-chain blowup)."""
    it = iter(sorted(term_bits.items()))
    t0, i0 = next(it)
    col = F.when(F.col("term") == t0, F.lit(1 << i0))
    for t, i in it:
        col = col.when(F.col("term") == t, F.lit(1 << i))
    return col.otherwise(F.lit(0)).cast("long")


def search_distributed(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    lang_filter: list[str] | None = None,
    repo_filter: list[str] | None = None,
    time_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Throughput path: one declarative plan over the merged index.

    Reads only the query terms' posting rows (pushdown on the range-
    partitioned `term` column), decodes them with a vectorized mapInPandas,
    joins doc lengths, sums BM25 contributions per doc, evaluates the query
    AST as a boolean filter, and takes the global top-k. Everything after the
    decode is Catalyst-planned (hash aggregate + TakeOrderedAndProject).

    Queries where a Field/Range/All clause is OR/XOR-reachable (or the whole
    query is termless — `lang:x AND ts:[..]`, `NOT q`) additionally union a
    doc_meta scan branch: rows that satisfy the AST with an EMPTY matched-
    terms set, anti-joined against the posting-hit docs, entering at BM25
    score 0.0. The reference evaluates field filters uniformly against full
    index masks (MiruAggregateUtil.java:1098-1241); this is the Spark form —
    the meta branch is a parquet-pushed filter scan of the forward index,
    no shuffle beyond the union's top-k.
    """
    h = IndexHandle.open(index_dir)
    from miru_spark import analyzers as anz

    ast = qp.parse_query(query, analyzer=anz.load(index_dir))
    termless = qp.can_match_termless(ast)
    expansions = expand_prefixes(index_dir, qp.prefixes(ast))
    needed = sorted(qp.all_terms(ast) | {t for ts in expansions.values() for t in ts})
    scoring = qp.positive_terms(ast) | {
        t for p in qp.positive_prefixes(ast) for t in expansions.get(p, [])
    }
    empty_schema = "doc_id long, score double, repo string, path string, commit string, lang string"
    if not needed and not termless:
        return spark.createDataFrame([], empty_schema)

    # driver-side abort-if-empty (miru's AND short circuit,
    # MiruAggregateUtil.java:1143): a required conjunct term absent from the
    # dictionary → the answer is provably empty, skip the whole job
    required = qp.required_terms(ast)
    if required:
        ds = _dataset(index_dir, "stats")
        present = set(
            ds.to_table(columns=["term"], filter=pads.field("term").isin(sorted(required)))
            .column("term").to_pylist()
        )
        if required - present:
            return spark.createDataFrame([], empty_schema)

    meta = spark.read.parquet(os.path.join(index_dir, "doc_meta"))
    has_ts = "ts" in meta.columns
    if (time_range is not None or qp.ranges(ast)) and not has_ts:
        raise ValueError("index has no doc-time column (built without ts)")
    if time_range is not None:
        # doc-time candidate mask (S4): parquet-pushed filter on the forward
        # index BEFORE the join — out-of-range docs never enter scoring;
        # df/avgdl/N stay corpus-global (mask-only semantics)
        meta = meta.filter(F.col("ts").between(time_range[0], time_range[1]))
    # lang/repo candidate masks push into the same scan (inner join on
    # doc_id → masked docs never enter scoring; statistics stay global)
    if lang_filter:
        meta = meta.filter(F.col("lang").isin(lang_filter))
    if repo_filter:
        meta = meta.filter(F.col("repo").isin(repo_filter))
    # the scoring plan carries ONLY doc_len + AST-referenced filter fields;
    # display fields gather post-top-k (_gather_display_fields)
    cond_fields = sorted(qp.filter_fields(ast) - {"doc_id", "doc_len"})
    meta_cols = ["doc_id", "doc_len"] + cond_fields
    removed = removal.removed_array(index_dir)

    # matched-terms agg state: one long bitmask when the query needs ≤63
    # distinct terms (the serving norm), collect_set(string) beyond that
    term_bits = (
        {t: i for i, t in enumerate(needed)} if len(needed) <= _BITMASK_MAX_TERMS else None
    )
    cond = _ast_to_condition(ast, expansions, term_bits)
    out_cols = ["doc_id", "score"]  # display fields gather post-top-k
    agg = out = None
    if needed:
        merged = (
            spark.read.parquet(os.path.join(index_dir, "merged"))
            .select("term", "docids", "tfs")  # column pruning: skip block metadata
            .filter(F.col("term").isin(needed))
        )

        def explode_postings(batches):
            for pdf in batches:
                for term, db, tb in zip(pdf["term"], pdf["docids"], pdf["tfs"]):
                    d, tf = decode_postings(db, tb)
                    yield pd.DataFrame({"term": term, "doc_id": d, "tf": tf.astype(np.int32)})

        hits = merged.mapInPandas(explode_postings, schema=_POSTING_ROW_SCHEMA)

        # removal mask: ANDNOT the (small) removed-doc set out of the hits before
        # the aggregation — broadcast anti-join, statistics stay corpus-global
        # (miru buildIndexMask semantics, MiruBitmapsRoaring.java:457-505)
        if removed.size:
            rdf = spark.createDataFrame([(int(x),) for x in removed.tolist()], "doc_id long")
            hits = hits.join(F.broadcast(rdf), "doc_id", "left_anti")

        # per-term idf from global stats (tiny — driver lookup, broadcast via literal map)
        stats = (
            spark.read.parquet(os.path.join(index_dir, "stats"))
            .filter(F.col("term").isin(needed))
            .select("term", "df")
        )
        stats = stats.withColumn(
            "idf", F.log((F.lit(h.n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        )

        scored = (
            hits.join(F.broadcast(stats), "term")
            .join(meta.select(*meta_cols), "doc_id")
            .withColumn(
                "contrib",
                F.when(
                    F.col("term").isin(sorted(scoring)),
                    F.col("idf")
                    * (F.col("tf") * (K1 + 1.0))
                    / (F.col("tf") + K1 * (1.0 - B + B * F.col("doc_len") / h.avgdl)),
                ).otherwise(F.lit(0.0)),
            )
        )
        if term_bits is not None:
            scored = scored.withColumn("tbit", _term_bit_column(term_bits))
            matched_agg = F.bit_or("tbit").alias("mbits")
        else:
            matched_agg = F.collect_set("term").alias("mts")
        aggs = [
            matched_agg,
            F.sum("contrib").alias("score"),
        ] + [F.first(c).alias(c) for c in cond_fields]
        agg = scored.groupBy("doc_id").agg(*aggs)
        out = agg.filter(cond)

    if termless:
        # forward-index candidate branch: docs matching the AST with ZERO
        # term hits (the condition over an empty mts IS that predicate).
        # Docs with any posting hit on an AST term were already decided in
        # the agg branch with their true mts — anti-join them out. Entry
        # score is 0.0 (no scored term matched).
        if term_bits is not None:
            mmeta = meta.select(*meta_cols).withColumn("mbits", F.lit(0).cast("long"))
        else:
            mmeta = meta.select(*meta_cols).withColumn(
                "mts", F.array().cast("array<string>")
            )
        extra = mmeta.filter(cond).withColumn("score", F.lit(0.0))
        if removed.size:
            rdf2 = spark.createDataFrame([(int(x),) for x in removed.tolist()], "doc_id long")
            extra = extra.join(F.broadcast(rdf2), "doc_id", "left_anti")
        if agg is not None:
            extra = extra.join(agg.select("doc_id"), "doc_id", "left_anti")
            out = out.select(*out_cols).unionByName(extra.select(*out_cols))
        else:
            out = extra
    top = (
        out.select(*out_cols)
        .orderBy(F.desc("score"), F.desc("doc_id"))
        .limit(k)
    )
    return _gather_display_fields(top, index_dir).orderBy(
        F.desc("score"), F.desc("doc_id")
    )


def search_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[str],
    k: int = 10,
    plan: str = "auto",
) -> DataFrame:
    """N queries answered in ONE job over ONE posting scan.

    The per-query form of ``search_distributed`` pays a full Spark job —
    scan + decode + shuffle + driver round-trip — per query string; serving
    a query LOG that way re-reads the index N times. This is the batched
    throughput path (the ``lsh_ann_batch`` treatment applied to BM25;
    reference analog: miru answers many MiruRequests against ONE shared
    request context/index handle rather than re-opening the index per
    question, MiruService solve loop):

    - driver: parse each query, expand prefixes, probe required terms
      against the dictionary (the AND short-circuit — provably-empty
      queries never reach the cluster);
    - cluster: one term-pushdown scan covering the UNION of all live
      queries' terms, one vectorized posting decode, one removal anti-join,
      then a broadcast (query_id, term, scoring) fan-out so each decoded
      posting row feeds every query that wants its term;
    - one (query_id, doc_id) aggregation; per-query AST filters applied as
      a flat CASE over query_id (each AST condition appears exactly once —
      plan size linear in N, see CLAUDE.md on when-chain blowup);
    - per-query top-k via row_number over the (score desc, doc_id desc)
      tie order on the 6-dp-rounded score.

    The index is read once regardless of N; adding a query whose terms
    overlap an existing one costs only its broadcast fan-out rows. Queries
    where a Field/Range/All clause is OR/XOR-reachable (or that are wholly
    termless) get the same doc_meta candidate branch as
    ``search_distributed`` — ONE extra meta scan covers all such queries
    (per-query termless predicates evaluated as an array of structs, rows
    exploded per matching query).

    Returns (query_id int, doc_id long, score double, rank int, repo, path,
    commit, lang) — doc_id is the ENGINE docID; callers map to their own
    ids from ``path`` as usual.
    """
    h = IndexHandle.open(index_dir)
    from miru_spark import analyzers as anz

    analyzer = anz.load(index_dir)
    out_schema = (
        "query_id int, doc_id long, score double, rank int, "
        "repo string, path string, commit string, lang string"
    )

    meta = spark.read.parquet(os.path.join(index_dir, "doc_meta"))
    has_ts = "ts" in meta.columns

    live: list[tuple[int, object, dict]] = []  # (qid, ast, expansions)
    union_needed: set[str] = set()
    all_required: set[str] = set()
    parsed = []
    for qid, q in enumerate(queries):
        ast = qp.parse_query(q, analyzer=analyzer)
        if qp.ranges(ast) and not has_ts:
            # same loud guard as search_distributed — otherwise the missing
            # ts column fails late with an opaque AnalysisException
            raise ValueError(
                f"query {qid!r}: index has no doc-time column (built without ts)"
            )
        parsed.append((qid, ast))
        all_required |= qp.required_terms(ast)

    # one dictionary probe for every required term of every query
    present: set[str] = set()
    if all_required:
        ds = _dataset(index_dir, "stats")
        present = set(
            ds.to_table(
                columns=["term"], filter=pads.field("term").isin(sorted(all_required))
            ).column("term").to_pylist()
        )
    for qid, ast in parsed:
        if qp.required_terms(ast) - present:
            continue  # a required conjunct is absent → provably empty
        expansions = expand_prefixes(index_dir, qp.prefixes(ast))
        needed = qp.all_terms(ast) | {t for ts in expansions.values() for t in ts}
        if not needed and not qp.can_match_termless(ast):
            continue
        union_needed |= needed
        live.append((qid, ast, expansions))
    if not live:
        return spark.createDataFrame([], out_schema)
    termless_live = [x for x in live if qp.can_match_termless(x[1])]

    # ---- masks mode: per-query conditions as DATA, plan size O(1) in N ----
    # Every live query that is a boolean over term literals (no Field/Range/
    # Xor) converts to CNF clause masks over a PER-QUERY bit assignment
    # (parser.cnf_clauses). The batch then needs no per-query expression at
    # all: one broadcast (query_id, term, bitval) fan-out, one bit_or agg,
    # one broadcast (query_id, clauses) table and a single forall filter.
    # The legacy CASE form (plan size linear in N — fine for interactive
    # batches, fatal for a 100k-query log replay) remains for batches
    # containing Field/Range/Xor queries.
    mask_specs: dict | None = None
    if plan != "case":
        mask_specs = {}
        for qid, ast, expansions in live:
            needed_q = sorted(
                qp.all_terms(ast) | {t for ts in expansions.values() for t in ts}
            )
            clauses = qp.cnf_clauses(ast, expansions)
            if clauses is None or len(needed_q) > _BITMASK_MAX_TERMS:
                mask_specs = None
                break
            bits = {t: i for i, t in enumerate(needed_q)}
            cl = [
                (
                    sum(1 << bits[t] for t in pos),
                    sum(1 << bits[t] for t in neg),
                )
                for pos, neg in clauses
            ]
            # the CNF evaluated at M=∅: a clause with an empty neg mask can
            # never hold termlessly — this IS the termless-match predicate
            matches_empty = all(neg for _, neg in cl)
            mask_specs[qid] = (bits, cl, matches_empty)
        if mask_specs is None and plan == "masks":
            raise ValueError(
                "batch contains a query not expressible as CNF term masks "
                "(Field/Range/Xor clause or >63 distinct terms)"
            )

    # scoring plan carries ONLY doc_len + the union of the live queries'
    # AST-referenced filter fields; display fields gather post-top-k
    cond_fields = sorted(
        set().union(*(qp.filter_fields(a) for _, a, _ in live)) - {"doc_id", "doc_len"}
    )
    meta_cols = ["doc_id", "doc_len"] + cond_fields

    removed = removal.removed_array(index_dir)
    out_cols = ["query_id", "doc_id", "score"]
    # legacy form: one bit assignment over the UNION of all live queries'
    # terms — every query's condition tests its own terms' bits
    union_sorted = sorted(union_needed)
    term_bits = (
        {t: i for i, t in enumerate(union_sorted)}
        if len(union_sorted) <= _BITMASK_MAX_TERMS
        else None
    )
    agg = out = None
    if union_needed:
        # (query_id, term, scoring[, bitval]) fan-out table
        qt_rows = []
        for qid, ast, expansions in live:
            scoring = qp.positive_terms(ast) | {
                t for p in qp.positive_prefixes(ast) for t in expansions.get(p, [])
            }
            needed = qp.all_terms(ast) | {t for ts in expansions.values() for t in ts}
            for t in sorted(needed):
                if mask_specs is not None:
                    qt_rows.append((qid, t, t in scoring, 1 << mask_specs[qid][0][t]))
                else:
                    qt_rows.append((qid, t, t in scoring))
        qt_schema = "query_id int, term string, scoring boolean" + (
            ", bitval long" if mask_specs is not None else ""
        )
        qt = spark.createDataFrame(qt_rows, qt_schema)
        # broadcast the fan-out while it is driver-sized; a log-replay-scale
        # batch (tens of millions of (query, term) rows) joins normally and
        # AQE picks the strategy
        if len(qt_rows) <= 2_000_000:
            qt = F.broadcast(qt)

        merged = (
            spark.read.parquet(os.path.join(index_dir, "merged"))
            .select("term", "docids", "tfs")
            .filter(F.col("term").isin(sorted(union_needed)))
        )

        def explode_postings(batches):
            for pdf in batches:
                for term, db, tb in zip(pdf["term"], pdf["docids"], pdf["tfs"]):
                    d, tf = decode_postings(db, tb)
                    yield pd.DataFrame({"term": term, "doc_id": d, "tf": tf.astype(np.int32)})

        hits = merged.mapInPandas(explode_postings, schema=_POSTING_ROW_SCHEMA)

        if removed.size:
            rdf = spark.createDataFrame([(int(x),) for x in removed.tolist()], "doc_id long")
            hits = hits.join(F.broadcast(rdf), "doc_id", "left_anti")

        stats = (
            spark.read.parquet(os.path.join(index_dir, "stats"))
            .filter(F.col("term").isin(sorted(union_needed)))
            .select("term", "df")
            .withColumn(
                "idf", F.log((F.lit(h.n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            )
        )

        scored = (
            hits.join(qt, "term")  # fan out each posting row per interested query
            .join(F.broadcast(stats), "term")
            .join(meta.select(*meta_cols), "doc_id")
            .withColumn(
                "contrib",
                F.when(
                    F.col("scoring"),
                    F.col("idf")
                    * (F.col("tf") * (K1 + 1.0))
                    / (F.col("tf") + K1 * (1.0 - B + B * F.col("doc_len") / h.avgdl)),
                ).otherwise(F.lit(0.0)),
            )
        )
        if mask_specs is not None:
            # masks mode: mbits = bit_or of the fan-out's PER-QUERY bitvals;
            # the filter is ONE expression over a broadcast clause table —
            # no per-query expressions anywhere in the plan
            agg = scored.groupBy("query_id", "doc_id").agg(
                F.bit_or("bitval").alias("mbits"),
                F.sum("contrib").alias("score"),
            )
            qc = spark.createDataFrame(
                [(qid, mask_specs[qid][1]) for qid, _, _ in live],
                "query_id int, clauses array<struct<pos: long, neg: long>>",
            )
            if len(live) <= 1_000_000:
                qc = F.broadcast(qc)
            out = (
                agg.join(qc, "query_id")
                .filter(
                    F.forall(
                        "clauses",
                        lambda c: (F.col("mbits").bitwiseAND(c["pos"]) != 0)
                        | (F.col("mbits").bitwiseAND(c["neg"]) != c["neg"]),
                    )
                )
                .withColumn("score", F.round(F.col("score"), 6))
            )
        else:
            if term_bits is not None:
                scored = scored.withColumn("tbit", _term_bit_column(term_bits))
                matched_agg = F.bit_or("tbit").alias("mbits")
            else:
                matched_agg = F.collect_set("term").alias("mts")
            aggs = [
                matched_agg,
                F.sum("contrib").alias("score"),
            ] + [F.first(c).alias(c) for c in cond_fields]
            agg = scored.groupBy("query_id", "doc_id").agg(*aggs)

            # flat CASE over query_id: each query's AST condition appears once
            cond = F.lit(False)
            for qid, ast, expansions in live:
                cond = F.when(
                    F.col("query_id") == qid, _ast_to_condition(ast, expansions, term_bits)
                ).otherwise(cond)
            out = agg.filter(cond).withColumn("score", F.round(F.col("score"), 6))

    if mask_specs is not None:
        # the termless predicate is a per-query CONSTANT in masks mode (the
        # CNF at M=∅) — computed on the driver, no per-query expressions
        empty_qids = [qid for qid, _, _ in live if mask_specs[qid][2]]
        extra = None
        if empty_qids:
            extra = (
                meta.select("doc_id")
                .select(
                    F.explode(F.array(*[F.lit(q) for q in empty_qids])).alias(
                        "query_id"
                    ),
                    "doc_id",
                    F.lit(0.0).alias("score"),
                )
            )
    elif termless_live:
        # ONE meta scan for every termless-capable query: per-query predicate
        # over an empty mts, evaluated as an array of (qid, matched) structs,
        # exploded to (query_id, doc) candidate rows at score 0.0
        if term_bits is not None:
            mmeta = meta.select(*meta_cols).withColumn("mbits", F.lit(0).cast("long"))
        else:
            mmeta = meta.select(*meta_cols).withColumn(
                "mts", F.array().cast("array<string>")
            )
        matches = F.filter(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).alias("qid"),
                        _ast_to_condition(ast, expansions, term_bits).alias("m"),
                    )
                    for qid, ast, expansions in termless_live
                ]
            ),
            lambda s: s["m"],
        )
        extra = (
            mmeta.withColumn("qids", matches)
            .filter(F.size("qids") > 0)
            .select(F.explode("qids").alias("q"), "doc_id")
            .select(
                F.col("q.qid").alias("query_id"),
                "doc_id",
                F.lit(0.0).alias("score"),
            )
        )
    else:
        extra = None

    if extra is not None:
        if removed.size:
            rdf2 = spark.createDataFrame([(int(x),) for x in removed.tolist()], "doc_id long")
            extra = extra.join(F.broadcast(rdf2), "doc_id", "left_anti")
        if agg is not None:
            extra = extra.join(
                agg.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti"
            )
            out = out.select(*out_cols).unionByName(extra.select(*out_cols))
        else:
            out = extra

    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    top = (
        out.select(*out_cols)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return _gather_display_fields(top, index_dir).select(
        "query_id", "doc_id", "score", "rank", "repo", "path", "commit", "lang"
    )
