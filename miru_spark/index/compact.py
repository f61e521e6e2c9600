"""Segment compaction: merge many small partitions into few large ones.

miru amortizes delta-index merges with "chits" and a largest-first policy
(miru-service/.../partition/MiruMergeChits.java:8-15, merge at
MiruPartitionAccessor.java:362-388): small deltas accumulate, then compact
into the persistent index. Our streaming appends (streaming/ingest.py) create
one small index partition per micro-batch partition — after a day of
micro-batches, thousands of tiny segments slow the merge and the manifest
scan. ``compact`` rewrites groups of ADJACENT pids (pid order = docID order)
into single segments:

- posting runs concatenate with the zero-decode first-varint rewrite
  (miru_spark.index.merge._concat_runs) using LOCAL offsets = cumulative doc
  counts within the group — docIDs keep their partition-local meaning, so
  the global merge is untouched semantically;
- forward-index rows concatenate with the same local-id rebasing;
- the multi-file group swap is JOURNALED: compacted data is staged under
  ``_``-prefixed names (invisible to Spark/pyarrow dataset scans), a journal
  records the intended swap, and only then are retired manifests/files
  removed and the compacted manifest published. A crash at ANY point leaves
  either the original state (no journal yet) or a journal whose staged
  files are complete — ``reconcile`` rolls the swap FORWARD idempotently, so
  doc counts are never double-counted and later partitions' global docIDs
  never shift. ``merge_segments`` reconciles before reading manifests.

Global docIDs are unchanged: offsets derive from manifest counts in pid
order, and compaction preserves both pid order and per-group totals.
Run ``merge_segments`` afterwards to refresh the queryable index.
"""

from __future__ import annotations

import json
import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from miru_spark.index.merge import _concat_runs
from miru_spark.jsonio import save_json_atomic


def _load_manifests(index_dir: str) -> list[dict]:
    reconcile(index_dir)
    man_dir = os.path.join(index_dir, "manifests")
    out = []
    for name in os.listdir(man_dir):
        if name.endswith(".json"):
            with open(os.path.join(man_dir, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m["pid"])


def _finish_swap(index_dir: str, journal: dict) -> None:
    """Roll a journaled group swap FORWARD (idempotent: every step tolerates
    having already happened). Order: retire old manifests, retire old data,
    promote staged data, publish compacted manifest, drop journal."""
    man_dir = os.path.join(index_dir, "manifests")
    for pid in journal["retired_pids"]:
        p = os.path.join(man_dir, f"partition_{pid}.json")
        if os.path.exists(p):
            os.remove(p)
    for f_ in journal["retired_files"]:
        if os.path.exists(f_):
            os.remove(f_)
    for staged, final in journal["promote"]:
        if os.path.exists(staged):
            os.replace(staged, final)
    mpath = os.path.join(man_dir, f"partition_{journal['manifest']['pid']}.json")
    save_json_atomic(mpath, journal["manifest"])
    os.remove(journal["_path"])


def reconcile(index_dir: str) -> int:
    """Complete any interrupted compaction swaps (called by merge before
    reading manifests). A journal's staged files are durable before the
    journal itself, so forward is always the safe direction. Returns the
    number of swaps completed."""
    man_dir = os.path.join(index_dir, "manifests")
    if not os.path.isdir(man_dir):
        return 0
    n = 0
    for name in os.listdir(man_dir):
        if name.endswith(".journal"):
            p = os.path.join(man_dir, name)
            with open(p) as f:
                journal = json.load(f)
            journal["_path"] = p
            _finish_swap(index_dir, journal)
            n += 1
    # sweep staged _compact_* files no surviving journal references: they are
    # orphans from a crash BEFORE their journal was written — nothing will
    # ever promote them, so without this they accumulate forever.  Files a
    # journal still lists stay put (rolling forward is that journal's job).
    referenced: set[str] = set()
    for name in os.listdir(man_dir):
        if name.endswith(".journal"):
            with open(os.path.join(man_dir, name)) as f:
                for staged, _final in json.load(f)["promote"]:
                    referenced.add(os.path.abspath(staged))
    for sub in ("segments", "doc_meta_local"):
        d = os.path.join(index_dir, sub)
        if not os.path.isdir(d):
            continue
        for f_ in os.listdir(d):
            p = os.path.join(d, f_)
            if f_.startswith("_compact_") and os.path.abspath(p) not in referenced:
                os.remove(p)
    return n


def _write_atomic(table: pa.Table, path: str) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp, compression="snappy")
    os.replace(tmp, path)


def compact(index_dir: str, target_docs: int = 1_000_000) -> dict:
    """Greedily group adjacent pids until ~target_docs, rewrite each group
    as one segment. Driver-side file rewrite (segments are small relative to
    the corpus; a Spark job version would map over groups identically).
    Returns {groups, before_partitions, after_partitions}."""
    manifests = _load_manifests(index_dir)
    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_docs = 0
    for m in manifests:
        if cur and cur_docs + m["n_docs"] > target_docs:
            groups.append(cur)
            cur, cur_docs = [], 0
        cur.append(m)
        cur_docs += m["n_docs"]
    if cur:
        groups.append(cur)

    seg_dir = os.path.join(index_dir, "segments")
    meta_dir = os.path.join(index_dir, "doc_meta_local")
    man_dir = os.path.join(index_dir, "manifests")
    n_before = len(manifests)

    for gi, group in enumerate(groups):
        if len(group) == 1:
            continue  # nothing to compact
        # local offsets within the group: cumulative docs in pid order
        off, acc = {}, 0
        for m in group:
            off[m["pid"]] = acc
            acc += m["n_docs"]
        # --- postings: read all group segments, concat runs per term
        frames = [pq.read_table(m["segment_file"]).to_pandas() for m in group]
        seg = pd.concat(frames, ignore_index=True)
        new_pid = group[0]["pid"]
        rows = []
        for term, grp in seg.groupby("term", sort=True):
            row = _concat_runs(grp, off, "pid")
            rows.append({"term": term, "pid": new_pid, **row})
        out = pd.DataFrame(rows)
        new_seg = os.path.join(seg_dir, f"seg_{new_pid}.parquet")
        new_meta = os.path.join(meta_dir, f"meta_{new_pid}.parquet")
        # stage under _-prefixed names: invisible to spark/pyarrow dataset
        # scans, and the live seg_{new_pid} stays the ORIGINAL (manifest-
        # consistent) bytes until the journaled swap promotes the staged copy
        staged_seg = os.path.join(seg_dir, f"_compact_seg_{new_pid}.parquet")
        staged_meta = os.path.join(meta_dir, f"_compact_meta_{new_pid}.parquet")
        schema = pq.read_schema(group[0]["segment_file"])
        _write_atomic(pa.Table.from_pandas(out[[f.name for f in schema]], schema=schema), staged_seg)

        # --- forward index: concat with rebased local ids
        metas = []
        for m in group:
            t = pq.read_table(m["meta_file"]).to_pandas()
            t["local_doc_id"] = t["local_doc_id"] + off[m["pid"]]
            t["pid"] = new_pid
            metas.append(t)
        meta_out = pd.concat(metas, ignore_index=True)
        mschema = pq.read_schema(group[0]["meta_file"])
        _write_atomic(pa.Table.from_pandas(meta_out[[f.name for f in mschema]], schema=mschema), staged_meta)

        # --- journal the swap (staged data durable first), then roll forward
        manifest = {
            "pid": new_pid,
            "n_docs": int(sum(m["n_docs"] for m in group)),
            "n_tokens": int(sum(m["n_tokens"] for m in group)),
            "n_postings": int(out["df"].sum()),
            "n_terms": int(len(out)),
            "doc_id_start": 0,
            "doc_id_end": int(sum(m["n_docs"] for m in group)) - 1,
            "segment_file": new_seg,
            "meta_file": new_meta,
            "status": "compacted",
        }
        journal = {
            "manifest": manifest,
            "retired_pids": [m["pid"] for m in group[1:]],
            "retired_files": [
                f_
                for m in group[1:]
                for f_ in (m["segment_file"], m["meta_file"])
                if f_ not in (new_seg, new_meta)
            ],
            "promote": [[staged_seg, new_seg], [staged_meta, new_meta]],
        }
        jpath = os.path.join(man_dir, f"compact_{new_pid}.journal")
        save_json_atomic(jpath, journal)
        journal["_path"] = jpath
        _finish_swap(index_dir, journal)

    return {
        "groups": len(groups),
        "before_partitions": n_before,
        "after_partitions": len(_load_manifests(index_dir)),
    }
