"""Batch scaling under the SERVING preset (half-res warps, pre-cast).

VERDICT r2 weak #5: exact-warp FlowNet2 batch scaling is flat-to-
negative (b1 22.2 -> b4 24.5 ms/pair, activation HBM pressure). The
serving preset quarters the gather traffic and halves warp-side
activations; this measures whether batching now pays at serving batch
sizes. Appends "serving_batch_sweep" to benchmarks/results.json.

Usage: python benchmarks/serving_batch_sweep.py [--batches 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="1,2,4,8")
    args = parser.parse_args()

    from bench import run_bench

    rows = {}
    for b in (int(x) for x in args.batches.split(",")):
        r = run_bench(batch=b, iters=8, repeats=3)
        rows[f"b{b}"] = {
            "ms_per_pair": r["ms_per_pair"],
            "pairs_per_sec": r["value"],
            "warp_mode": r["warp_mode"],
        }
        print(f"  b{b}: {r['ms_per_pair']:7.3f} ms/pair "
              f"({r['value']:.1f} pairs/s, {r['warp_mode']})", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["serving_batch_sweep"] = rows
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
