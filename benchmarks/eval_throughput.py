"""Dataset-eval throughput: pairs/sec through ``evaluate_dataset``
(VERDICT r3 #8 — the eval surface gets a perf number like every other
path).

``evaluate_dataset`` buckets mixed-size inputs to %64 shapes and
batches within buckets (``--eval_batch``). This measures pairs/sec on
a mixed-size synthetic set (two bucket shapes, the KITTI size-jitter
case bucketing exists for) at b1 vs b8, f32 and bf16, steady-state
(a warmup pass compiles each bucket; the timed pass reuses the jits).

Appends "eval_throughput" to benchmarks/results.json. Caveat under the
axon relay: evaluate_dataset fetches two scalars per BATCH, so the
~28 ms RPC inflates absolute rates at these sizes — read the b8-vs-b1
ratio, not the absolute pairs/sec (on a real host the fetch is ~free).

Usage: python benchmarks/eval_throughput.py [--pairs 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class MixedSizeDataset:
    """Synthetic {image_a, image_b, flow} pairs alternating between two
    resolutions (two %64 buckets after padding)."""

    def __init__(self, n, seed=0):
        self.n = n
        self.rng = np.random.RandomState(seed)
        self.shapes = [(192, 256), (160, 224)]
        self.items = []
        for i in range(n):
            h, w = self.shapes[i % 2]
            self.items.append({
                "image_a": self.rng.rand(h, w, 3).astype(np.float32),
                "image_b": self.rng.rand(h, w, 3).astype(np.float32),
                "flow": (self.rng.rand(h, w, 2).astype(np.float32) - 0.5)
                * 6.0,
            })

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=48)
    ap.add_argument("--model", default="2")
    args = ap.parse_args()

    import jax

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache
    from flownet2_tf_tpu.training.infer import evaluate_dataset

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)

    params = get_model(args.model).init(jax.random.PRNGKey(0))
    ds = MixedSizeDataset(args.pairs)

    rows = {}
    for dtype in ("float32", "bfloat16"):
        for bs in (1, 8):
            # warmup compiles each bucket's jit; timed pass reuses them
            evaluate_dataset(args.model, params, ds, compute_dtype=dtype,
                             limit=2 * bs, batch_size=bs)
            t0 = time.perf_counter()
            aee = evaluate_dataset(args.model, params, ds,
                                   compute_dtype=dtype, batch_size=bs)
            dt = time.perf_counter() - t0
            key = f"{dtype}_b{bs}"
            rows[key] = {
                "pairs_per_sec": round(args.pairs / dt, 2),
                "ms_per_pair": round(dt / args.pairs * 1000, 2),
                "aee_px": round(float(aee), 4),
            }
            print(f"  {key}: {rows[key]}", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["eval_throughput"] = {
        "model": args.model, "pairs": args.pairs,
        "mixed_shapes": "192x256 / 160x224", **rows,
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
