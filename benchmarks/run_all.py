"""Full benchmark sweep: per-op, per-model forward, and train-step
throughput. Writes benchmarks/results.json and prints a table.

Usage: python benchmarks/run_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--height", type=int, default=448)
    parser.add_argument("--width", type=int, default=1024)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops.correlation import correlation
    from flownet2_tf_tpu.ops.flow_warp import flow_warp
    from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1
    from flownet2_tf_tpu.tools.benchlib import marginal_ms, train_step_ms

    H, W = args.height, args.width
    rng = np.random.RandomState(0)
    results = {"backend": jax.default_backend(), "height": H, "width": W}

    img = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    imgb = img.astype(jnp.bfloat16)
    flw = jnp.asarray((rng.rand(1, H, W, 2).astype(np.float32) - 0.5) * 8)

    print("== ops", flush=True)
    results["ops"] = {}
    results["ops"]["flow_warp_f32_ms"] = marginal_ms(
        lambda a, f, x: flow_warp(a, f + x).mean(), img, flw
    )
    results["ops"]["flow_warp_bf16_ms"] = marginal_ms(
        lambda a, f, x: flow_warp(a, f + x).mean(), imgb, flw
    )
    fh, fw = H // 8, W // 8
    fa = jnp.asarray(rng.randn(1, fh, fw, 256).astype(np.float32))
    fb = jnp.asarray(rng.randn(1, fh, fw, 256).astype(np.float32))
    results["ops"]["correlation_oracle_ms"] = marginal_ms(
        lambda a, b, x: correlation(
            a + x, b, 1, 20, 1, 2, 20, implementation="oracle"
        ).mean(),
        fa, fb,
    )
    try:
        results["ops"]["correlation_pallas_ms"] = marginal_ms(
            lambda a, b, x: correlation(
                a + x, b, 1, 20, 1, 2, 20, implementation="pallas"
            ).mean(),
            fa, fb,
        )
    except Exception as e:  # pallas unavailable off-TPU
        results["ops"]["correlation_pallas_ms"] = f"n/a: {e}"
    small = jnp.asarray(rng.rand(1, H // 4, W // 4, 2).astype(np.float32))
    results["ops"]["resize_tf1_ms"] = marginal_ms(
        lambda s, x: resize_bilinear_tf1(s + x, H, W).mean(), small
    )
    for k, v in results["ops"].items():
        print(f"   {k:28s} {v if isinstance(v, str) else round(v, 3)}")

    print("== model forward (bf16)", flush=True)
    results["forward_ms"] = {}
    models = ("s", "c") if args.quick else ("s", "c", "cs", "css", "sd", "2")
    for name in models:
        m = get_model(name)
        p = m.init(jax.random.PRNGKey(0))
        ms = marginal_ms(
            lambda p, a, b, x, m=m: m.apply(
                p, {"input_a": a + x, "input_b": b},
                compute_dtype=jnp.bfloat16,
            )["flow"].mean(),
            p, img, img,
            n_big=8 if name in ("css", "2") else 12,
        )
        results["forward_ms"][name] = ms
        print(f"   flownet_{name:3s} {ms:8.2f} ms  "
              f"({1000.0 / ms:.1f} pairs/sec)", flush=True)

    print("== train step (FlowNetS, b8 @320x448, bf16)", flush=True)
    ms, examples_per_sec = train_step_ms(
        "s", batch=8, height=320, width=448, iters=4 if args.quick else 8
    )
    results["train_step"] = {
        "model": "s", "batch": 8, "ms_per_step": ms,
        "examples_per_sec": examples_per_sec,
    }
    print(f"   {ms:.1f} ms/step, {examples_per_sec:.1f} examples/sec")

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
