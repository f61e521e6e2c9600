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
- new manifests replace the group's manifests atomically (write-then-rename,
  new files before manifest swap — the same durability order as the build).

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


def _load_manifests(index_dir: str) -> list[dict]:
    man_dir = os.path.join(index_dir, "manifests")
    out = []
    for name in os.listdir(man_dir):
        if name.endswith(".json"):
            with open(os.path.join(man_dir, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m["pid"])


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
        schema = pq.read_schema(group[0]["segment_file"])
        _write_atomic(pa.Table.from_pandas(out[[f.name for f in schema]], schema=schema), new_seg)

        # --- forward index: concat with rebased local ids
        metas = []
        for m in group:
            t = pq.read_table(m["meta_file"]).to_pandas()
            t["local_doc_id"] = t["local_doc_id"] + off[m["pid"]]
            t["pid"] = new_pid
            metas.append(t)
        meta_out = pd.concat(metas, ignore_index=True)
        new_meta = os.path.join(meta_dir, f"meta_{new_pid}.parquet")
        mschema = pq.read_schema(group[0]["meta_file"])
        _write_atomic(pa.Table.from_pandas(meta_out[[f.name for f in mschema]], schema=mschema), new_meta)

        # --- manifests: new one first (atomic), then retire the rest
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
        mpath = os.path.join(man_dir, f"partition_{new_pid}.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        for m in group[1:]:
            os.remove(os.path.join(man_dir, f"partition_{m['pid']}.json"))
            if m["segment_file"] != new_seg:
                os.remove(m["segment_file"])
            if m["meta_file"] != new_meta:
                os.remove(m["meta_file"])

    return {
        "groups": len(groups),
        "before_partitions": n_before,
        "after_partitions": len(_load_manifests(index_dir)),
    }
