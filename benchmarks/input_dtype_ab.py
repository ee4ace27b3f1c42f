"""Serving input-dtype A/B: what does the f32 input relayout cost?

The per-op ledger (docs/DESIGN.md "categorized op ledger") charges
~1.0 ms/pair of the serving-preset FlowNet2 forward to f32 relayouts of
the INPUT images (the SD branch's 2x2 pool and the S2D input fold both
consume the full-res f32 pair before the bf16 feature path begins).
Serving hosts hold uint8 images anyway, so three ingestion contracts
are measurable:

  f32    — today's surface: host normalizes to f32 [0,1] (4 B/px/ch
           transferred, f32 relayouts on device);
  bf16   — host normalizes then casts to bf16 (2 B/px/ch; the input-
           side relayouts run at half the bytes);
  uint8  — host ships raw bytes (1 B/px/ch); the graph casts to the
           compute dtype and multiplies by 1/255 on device.

Numerics: the bf16 feature path already casts the f32 input to bf16 at
the first conv, so bf16/uint8 ingestion only reorders that rounding
(uint8 values 0..255 are exact in bf16; the *(1/255) product rounds
once, same as the cast of a host-normalized value). The f32 parity path
keeps f32 ingestion. Flow delta on trained weights is measured below.

Appends "input_dtype" to benchmarks/results.json.
Usage: python benchmarks/input_dtype_ab.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.common import cast_params_for_inference
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache, \
        marginal_ms
    from benchmarks.halfres_warp_ab import load_trained_params

    enable_compilation_cache()
    model = get_model("2")
    params = load_trained_params()
    trained = params is not None
    if not trained:
        print("no trained ckpt — random init", flush=True)
        params = model.init(jax.random.PRNGKey(0))
    params_bf16 = cast_params_for_inference(params, jnp.bfloat16)

    rng = np.random.RandomState(0)
    u8_a = rng.randint(0, 256, (1, 448, 1024, 3), dtype=np.uint8)
    u8_b = rng.randint(0, 256, (1, 448, 1024, 3), dtype=np.uint8)
    f32_a = (u8_a.astype(np.float32)) / 255.0
    f32_b = (u8_b.astype(np.float32)) / 255.0

    def fwd(p, x, y, t):
        # uint8/bf16 ingestion: normalize/cast INSIDE the jitted graph
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
            y = y.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        return model.apply(
            p, {"input_a": x + t.astype(x.dtype), "input_b": y},
            compute_dtype=jnp.bfloat16,
        )["flow"].mean()

    row = {"trained_weights": trained}
    print("== serving preset (half-res warps, pre-cast params), b1 "
          "448x1024", flush=True)
    cases = {
        "f32": (jnp.asarray(f32_a), jnp.asarray(f32_b)),
        "bf16": (jnp.asarray(f32_a, jnp.bfloat16),
                 jnp.asarray(f32_b, jnp.bfloat16)),
        "uint8": (jnp.asarray(u8_a), jnp.asarray(u8_b)),
    }
    with dispatch.use_half_res_warp(True):
        for name, (a, b) in cases.items():
            ms = marginal_ms(fwd, params_bf16, a, b, repeats=3)
            row[f"forward_ms_{name}"] = ms
            print(f"  {name:6s}: {ms:7.2f} ms/pair", flush=True)

    # accuracy: flow delta of uint8/bf16 ingestion vs the f32 serving
    # anchor, same weights, exact same uint8 source image
    @functools.partial(jax.jit, static_argnums=())
    def flow_of(p, x, y):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
            y = y.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        return model.apply(
            p, {"input_a": x, "input_b": y}, compute_dtype=jnp.bfloat16
        )["flow"]

    with dispatch.use_half_res_warp(True):
        ref = np.asarray(flow_of(params_bf16, *cases["f32"]))
        for name in ("bf16", "uint8"):
            d = np.abs(
                np.asarray(flow_of(params_bf16, *cases[name])) - ref
            )
            row[f"flow_delta_px_mean_{name}"] = float(d.mean())
            row[f"flow_delta_px_max_{name}"] = float(d.max())
            print(f"  {name:6s} vs f32 ingestion: mean "
                  f"{d.mean():.6f} px, max {d.max():.4f} px", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["input_dtype"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
