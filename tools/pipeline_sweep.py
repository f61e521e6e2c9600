"""Wall-time sweep of the training-data pipeline operators at large doc counts.

The sf0.01 gate proves CORRECTNESS; this proves the PLAN — that candidate
generation stays bucketed, label propagation converges with truncated
lineage, and prefix sums stay distributed when the corpus grows decades
beyond the bench SF. Round 2 ran this shape ad-hoc at 1M docs and caught two
scale-only bugs (BASELINE.md "Training-data operators at 1M docs"); this
tool makes the sweep repeatable and extends it to 10M.

    python tools/pipeline_sweep.py --docs 10000000 [--ops minhash_lsh_pairs ...]
                                   [--out BENCH_SWEEP.json] [--keep-dir]

Corpus: ``generate_corpus``'s deterministic content (seed 11, same as the
1M table) reshaped to the documents-table schema (doc_id,text,lang,source,
n_chars) — row i depends only on (seed, i), so any --docs prefix is a
superset-consistent corpus. Written once to parquet, then each operator runs
against it exactly as it runs against /root/testdata (same (spark, sf_dir)
entry points the gate uses — nothing bench-special).

One rep per op by default (these are minutes-long jobs; the ±20% shared-host
envelope is noted where results are transcribed into BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time
from collections.abc import Iterator

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys

sys.path.insert(0, REPO)

from miru_spark.corpus import _gen_rows  # noqa: E402
from miru_spark.session import get_spark  # noqa: E402
from tools.host_probe import BW_HEALTHY_GBPS, probe  # noqa: E402

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def write_documents(spark, n_docs: int, out_dir: str, seed: int = 11, partitions: int = 64) -> str:
    """Generate + write the documents table; returns the sf_dir-like path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if not len(ids):
                continue
            rows = _gen_rows(int(ids.min()), int(ids.max()) + 1, seed)
            yield pd.DataFrame(
                {
                    "doc_id": range(int(ids.min()), int(ids.max()) + 1),
                    "text": rows["content"],
                    "lang": rows["lang"],
                    "source": rows["repo"],
                    "n_chars": rows["content"].str.len().astype("int64"),
                }
            )

    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(out_dir, "_SWEEP_READY")):
        return out_dir  # reuse a previous identical generation
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    base = spark.range(0, n_docs, 1, partitions)
    base.mapInPandas(gen, schema=DOCS_SCHEMA).write.mode("overwrite").parquet(path)
    with open(os.path.join(out_dir, "_SWEEP_READY"), "w") as f:
        f.write(str(n_docs))
    return out_dir


DEFAULT_OPS = [
    "dedup_exact",
    "lang_id",
    "decontaminate",
    "training_shards",
    "simhash_neardup_pairs",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_survivors",
]


def resolve_ops(names: list[str]):
    from miru_spark.pipeline.registry import pipeline_ops

    registry = pipeline_ops()
    return [(n, registry[n]) for n in names]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--ops", nargs="*", default=DEFAULT_OPS)
    ap.add_argument("--dir", default=None, help="corpus dir (default /tmp/miru_sweep_<docs>)")
    ap.add_argument("--out", default="BENCH_SWEEP.json")
    ap.add_argument("--keep-dir", action="store_true")
    args = ap.parse_args()

    sweep_dir = args.dir or os.path.join("/tmp", f"miru_sweep_{args.docs}")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pipeline_sweep", cores=cores, shuffle_partitions=2 * cores)

    t0 = time.perf_counter()
    write_documents(spark, args.docs, sweep_dir, seed=args.seed)
    gen_sec = time.perf_counter() - t0
    print(f"# corpus ready in {gen_sec:.1f}s at {sweep_dir}", flush=True)

    results: dict[str, dict] = {}
    for name, fn in resolve_ops(args.ops):
        # host weather BEFORE each op: this shared-host VM has episodes where
        # co-tenant pressure cuts memory bandwidth >10x with zero guest-side
        # signal (no steal, CPU "busy"); identical Spark jobs measured 40 s
        # healthy vs 798 s degraded. A timing row taken under a bad probe is
        # labeled so it is never transcribed into BASELINE.md as a real number.
        pre = probe()
        t0 = time.perf_counter()
        # persist-then-count, NOT a bare count(): count() lets Catalyst
        # legally eliminate cardinality-preserving branches (decontaminate's
        # left join against a lang-unique aggregate dropped its entire
        # text-scan side — 1.5 s "wall" for a 28 s job). Persisting forces
        # every output column to materialize exactly once.
        out = fn(spark, sweep_dir).persist()
        rows = out.count()
        wall = time.perf_counter() - t0
        out.unpersist()
        # ops leak scoped_cache generations by design (the returned lazy DF
        # depends on them); running N ops serially in ONE session otherwise
        # accumulates pinned 1M-doc relations until the heap thrashes
        # (measured: minhash 453 s after training_shards' cache vs 40 s clean)
        spark.catalog.clearCache()
        post = probe()
        bw = min(pre["bw_gbps"], post["bw_gbps"])
        results[name] = {
            "wall_sec": round(wall, 1),
            "rows": rows,
            "bw_gbps_pre": pre["bw_gbps"],
            "bw_gbps_post": post["bw_gbps"],
            "host_degraded": bw < BW_HEALTHY_GBPS,
        }
        flag = " [HOST DEGRADED]" if bw < BW_HEALTHY_GBPS else ""
        print(f"# {name}: {wall:.1f}s rows={rows} bw={pre['bw_gbps']}/{post['bw_gbps']}{flag}", flush=True)

    payload = {
        "docs": args.docs,
        "seed": args.seed,
        "cores": cores,
        "gen_sec": round(gen_sec, 1),
        "ops": results,
    }
    print(json.dumps(payload))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    if not args.keep_dir:
        shutil.rmtree(sweep_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
