"""Full benchmark sweep: per-op, per-model forward, and train-step
throughput. Merges its rows into benchmarks/results.json and prints a
table. The specialized sweeps write their own rows there too:
serving_batch_sweep.py (serving preset), halfres_warp_ab.py (accuracy
trade), memory_bench.py (remat/grad_accum HBM), input_pipeline.py,
spatial_seam.py, aot_serving_bench.py, f32_precision_probe.py,
input_dtype_ab.py.

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
    results["ops"]["correlation_mxu_ms"] = marginal_ms(
        lambda a, b, x: correlation(
            a + x, b, 1, 20, 1, 2, 20, implementation="mxu"
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

    from flownet2_tf_tpu.tools import benchlib

    peak_flops, peak_bw = benchlib.device_peaks()

    print("== model forward (bf16)", flush=True)
    results["forward_ms"] = {}
    results["forward_roofline"] = {}
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
        flops, hbm = benchlib.cost_analysis(
            lambda p, a, b, m=m: m.apply(
                p, {"input_a": a, "input_b": b}, compute_dtype=jnp.bfloat16
            )["flow"].mean(),
            p, img, img,
        )
        roof = {}
        if flops:
            roof["tflops_per_pair"] = flops / 1e12
            if peak_flops:
                roof["mfu"] = flops / (ms / 1e3) / peak_flops
        if hbm:
            # un-fused per-op byte sum: an upper bound, not traffic
            roof["hbm_gb_xla_opsum_bound"] = hbm / 1e9
            if peak_bw:
                roof["hbm_gb_physical_ceiling"] = (ms / 1e3) * peak_bw / 1e9
        results["forward_roofline"][name] = roof
        extra = ""
        if "mfu" in roof:
            extra = f"  mfu={roof['mfu']:.3f}"
        print(f"   flownet_{name:3s} {ms:8.2f} ms  "
              f"({1000.0 / ms:.1f} pairs/sec){extra}", flush=True)

    if not args.quick:
        # second resolution (the FlyingChairs native 384x512) and the
        # batch-scaling sweep on the headline model (VERDICT r1 #4/#6)
        print("== flownet2 extra shapes", flush=True)
        m2 = get_model("2")
        p2 = m2.init(jax.random.PRNGKey(0))
        img_sm = jnp.asarray(rng.rand(1, 384, 512, 3).astype(np.float32))
        ms = marginal_ms(
            lambda p, a, b, x: m2.apply(
                p, {"input_a": a + x, "input_b": b},
                compute_dtype=jnp.bfloat16,
            )["flow"].mean(),
            p2, img_sm, img_sm, n_big=10,
        )
        results["forward_ms"]["2_384x512"] = ms
        print(f"   flownet_2 @384x512  {ms:8.2f} ms "
              f"({1000.0 / ms:.1f} pairs/sec)", flush=True)

        results["batch_sweep_flownet2"] = {}
        for bsz in (1, 2, 4):
            ab = jnp.asarray(rng.rand(bsz, H, W, 3).astype(np.float32))
            bb = jnp.asarray(rng.rand(bsz, H, W, 3).astype(np.float32))
            ms = marginal_ms(
                lambda p, a, b, x: m2.apply(
                    p, {"input_a": a + x, "input_b": b},
                    compute_dtype=jnp.bfloat16,
                )["flow"].mean(),
                p2, ab, bb, n_big=8,
            )
            results["batch_sweep_flownet2"][f"b{bsz}"] = {
                "ms_per_batch": ms,
                "pairs_per_sec": bsz / (ms / 1e3),
            }
            print(f"   flownet_2 b{bsz}  {ms:8.2f} ms/batch "
                  f"({bsz / (ms / 1e3):.1f} pairs/sec)", flush=True)

    print("== train step (FlowNetS, b8 @320x448, bf16)", flush=True)
    ms, examples_per_sec = train_step_ms(
        "s", batch=8, height=320, width=448, iters=4 if args.quick else 8
    )
    results["train_step"] = {
        "model": "s", "batch": 8, "ms_per_step": ms,
        "examples_per_sec": examples_per_sec,
    }
    print(f"   {ms:.1f} ms/step, {examples_per_sec:.1f} examples/sec")

    if not args.quick:
        # stacked-net training: warps (and their scatter-add backward)
        # inside the step — the case the per-sample gather split serves
        print("== train step (FlowNetCS, b8 @320x448, bf16)", flush=True)
        ms, examples_per_sec = train_step_ms(
            "cs", batch=8, height=320, width=448, iters=6
        )
        results["train_step_cs"] = {
            "model": "cs", "batch": 8, "ms_per_step": ms,
            "examples_per_sec": examples_per_sec,
        }
        print(f"   {ms:.1f} ms/step, {examples_per_sec:.1f} examples/sec")

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    # MERGE into the accumulated results: the specialized sweeps
    # (serving_batch_sweep, halfres_warp_ab, memory_bench, ...) append
    # their own rows to this file — a plain overwrite would destroy them
    try:
        with open(out_path) as f:
            merged = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        merged = {}
    merged.update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2, default=str)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
