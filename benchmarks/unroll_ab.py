"""Unroll-vs-lax.map A/B for the per-sample warp gather split, and the
serving b4 anomaly probe (VERDICT r3 weak #2).

``_UNROLL_MAX_SAMPLES`` (ops/sampling.py) decides whether a batched
warp issues N Python-unrolled per-sample gathers or one rolled
``lax.map`` body. The value was originally set for COMPILE-time sanity
(ADVICE r2); this measures the RUNTIME difference under the serving
preset at b2..b16 so the threshold is justified by data. Each variant
runs in a fresh subprocess (the knob is import-frozen: the jitted warp
bodies close over it at trace time).

Appends ``unroll_ab`` to benchmarks/results.json:
  {"b{N}": {"unroll": ms_per_pair, "map": ms_per_pair}}

Usage: python benchmarks/unroll_ab.py [--batches 2,4,8,16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
import json
from flownet2_tf_tpu.tools.bench import run_bench
r = run_bench(batch={batch}, iters=8, repeats=3)
print("RESULT " + json.dumps(r["ms_per_pair"]))
"""


def run_variant(batch: int, threshold: int) -> float:
    # One retry on a hung child: the axon relay connection can stall
    # permanently if it is opened while the single host core is
    # oversubscribed (observed r4: a child sat 20 min in ep_poll with
    # 22 s of CPU); a fresh process gets a fresh connection.
    env = dict(os.environ, FLOWNET2_TPU_UNROLL_MAX=str(threshold))
    last_exc = None
    for attempt in range(2):
        try:
            out = subprocess.run(
                [sys.executable, "-c", _CHILD.format(repo=REPO, batch=batch)],
                env=env, cwd=REPO, capture_output=True, text=True,
                timeout=900,
            )
        except subprocess.TimeoutExpired as exc:
            last_exc = exc
            print(f"  b{batch} thr {threshold}: child hung (attempt "
                  f"{attempt + 1}/2), retrying", flush=True)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return float(json.loads(line[len("RESULT "):]))
        raise RuntimeError(
            f"bench child failed (b{batch}, thr {threshold}):\n"
            f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        )
    raise RuntimeError(
        f"bench child hung twice (b{batch}, thr {threshold}): {last_exc}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8,16")
    args = ap.parse_args()

    out_path = os.path.join(os.path.dirname(__file__), "results.json")

    def merge(rows):
        # per-batch incremental merge so a hung later point cannot lose
        # the earlier measurements (the r4 b4 hang cost the whole row);
        # tolerate a fresh checkout with no results.json yet (ADVICE r4)
        try:
            with open(out_path) as f:
                results = json.load(f)
        except FileNotFoundError:
            results = {}
        results.setdefault("unroll_ab", {}).update(rows)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, default=str)

    for b in (int(x) for x in args.batches.split(",")):
        # threshold above b => per-sample Python unroll; 0 => lax.map
        row = {
            "unroll": run_variant(b, 99),
            "map": run_variant(b, 0),
        }
        print(f"  b{b}: unroll {row['unroll']:7.3f} vs "
              f"map {row['map']:7.3f} ms/pair", flush=True)
        merge({f"b{b}": row})
    print("wrote", out_path)


if __name__ == "__main__":
    main()
