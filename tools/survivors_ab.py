"""Same-day A/B: dedup_survivors with vs without pointer doubling (sf0.1).

Round-3 verdict flagged `dedup_survivors` 4.72 -> 11.38 s at sf0.1 (2.41x) as
the round's one `weak` mark: the star-edge + pointer-doubling rewrite is
provably the right form at 1M/10M docs (394.9 -> 207.7 s probe-labeled), but
at tiny scale the doubling step adds one extra labels self-join + one extra
localCheckpoint per round, and the r3 suite ran on a degraded host — so the
2.41x could be host, doubling overhead, or both. This prices it directly:

  for form in (doubling, plain):   # same day, same probe band
      reps x [fresh session -> probe -> time dedup_survivors -> probe]

Each measurement is a FRESH subprocess (fresh-session protocol from
BASELINE.md: in-sweep vs fresh-session survivors measured 395 vs 268 s, so
session history is a confound), with host probes stamped pre/post per rep.
Reports min + all walls + propagation round counts per form.

    python tools/survivors_ab.py [--sf /root/testdata/sf0.1] [--reps 2]
        [--out SURVIVORS_AB.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(sf_dir: str, doubling: bool, max_iter: int) -> None:
    from miru_spark.session import get_spark
    from miru_spark.pipeline.dedup import dedup_survivors

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("survivors_ab", cores=cores, shuffle_partitions=2 * cores)
    diag: dict = {}
    t0 = time.perf_counter()
    # dedup_survivors materializes internally (collect of the per-lang rows),
    # so the wall below covers the whole operator; the trailing count() only
    # touches the tiny local result.
    out = dedup_survivors(spark, sf_dir, max_iter=max_iter, _doubling=doubling, _diag=diag)
    rows = out.count()
    wall = time.perf_counter() - t0
    print(json.dumps({"wall_sec": round(wall, 2), "rows": rows, "rounds": diag.get("rounds")}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    # plain neighbor-min needs O(diameter) rounds; give it headroom so the
    # A/B measures cost, not the convergence guard
    ap.add_argument("--max-iter", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(REPO, "SURVIVORS_AB.json"))
    ap.add_argument("--child", choices=["doubling", "plain"], default=None)
    args = ap.parse_args()

    if args.child:
        child(args.sf, args.child == "doubling", args.max_iter)
        return

    from tools.host_probe import BW_HEALTHY_GBPS, probe

    results: dict[str, dict] = {}
    for form in ("doubling", "plain"):
        walls, rounds, probes = [], [], []
        for _ in range(args.reps):
            pre = probe()
            cp = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", form,
                 "--sf", args.sf, "--max-iter", str(args.max_iter)],
                capture_output=True, text=True, timeout=1800,
            )
            post = probe()
            if cp.returncode != 0:
                print(cp.stdout[-2000:], cp.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"{form} rep failed")
            rec = json.loads(cp.stdout.strip().splitlines()[-1])
            walls.append(rec["wall_sec"])
            rounds.append(rec["rounds"])
            probes.append((pre["bw_gbps"], post["bw_gbps"]))
            print(f"# {form}: {rec['wall_sec']}s rounds={rec['rounds']} "
                  f"bw={pre['bw_gbps']}/{post['bw_gbps']}", flush=True)
        results[form] = {
            "walls_sec": walls,
            "min_sec": min(walls),
            "rounds": rounds,
            "probes_gbps": probes,
            "host_degraded": any(min(p) < BW_HEALTHY_GBPS for p in probes),
        }
    payload = {"sf": args.sf, "reps": args.reps, "max_iter": args.max_iter, "forms": results}
    print(json.dumps(payload))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
