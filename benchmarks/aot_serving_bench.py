"""AOT .flowpak serving-path cost: artifact call vs direct jit forward.

The exported StableHLO is re-traced into the caller's jit (jax.export's
call_exported primitive), so the steady-state cost should equal the
direct forward — this measures that claim on the headline serving
config (FlowNet2 448x1024 b1 bf16, half-res warps), plus the one-time
costs a serving host actually pays: artifact size, load (deserialize +
weight unflatten) and first-call compile.

Usage: python benchmarks/aot_serving_bench.py [--height 448 --width 1024]
Appends "aot_serving" to benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=448)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--model", default="2")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.common import cast_params_for_inference
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools import aot
    from flownet2_tf_tpu.tools.benchlib import (
        enable_compilation_cache,
        marginal_ms,
    )

    enable_compilation_cache()
    H, W = args.height, args.width
    m = get_model(args.model)
    params = m.init(jax.random.PRNGKey(0))

    pak = os.path.join(tempfile.gettempdir(),
                       f"aot_bench_{args.model}_{H}x{W}.flowpak")
    t0 = time.perf_counter()
    aot.export_serving(args.model, params, H, W, pak,
                       compute_dtype="bfloat16", warp_mode="half")
    export_s = time.perf_counter() - t0
    size_mb = os.path.getsize(pak) / 1e6

    t0 = time.perf_counter()
    served = aot.load_serving(pak)
    load_s = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

    t0 = time.perf_counter()
    served(np.asarray(a), np.asarray(b))
    first_call_s = time.perf_counter() - t0

    # steady-state: chain the exported call in the same differenced-scan
    # harness the headline bench uses (call_exported is traceable)
    exported = served._exported
    sparams = served._params
    ms_artifact = marginal_ms(
        lambda p, a, b, x: exported.call(p, a + x, b)[..., 0].mean(),
        sparams, a, b,
        n_big=8,
    )

    cast = cast_params_for_inference(params)
    with dispatch.use_half_res_warp(True):
        ms_direct = marginal_ms(
            lambda p, a, b, x: m.apply(
                p, {"input_a": a + x, "input_b": b},
                compute_dtype=jnp.bfloat16,
            )["flow"][..., 0].mean(),
            cast, a, b,
            n_big=8,
        )

    row = {
        "model": args.model,
        "height": H,
        "width": W,
        "artifact_mb": round(size_mb, 1),
        "export_s": round(export_s, 2),
        "load_s": round(load_s, 2),
        "first_call_s": round(first_call_s, 2),
        "ms_per_pair_artifact": round(ms_artifact, 3),
        "ms_per_pair_direct": round(ms_direct, 3),
    }
    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["aot_serving"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
