"""Coarse-warp SOURCE dtype A/B: f32 vs bf16 pooled image / packed
table / gathered records (dispatch.use_warp_source_dtype).

The r2 full-res ``gather_dtype`` experiment REJECTED bf16 tables: the
f32->bf16 relayout XLA inserts around the full-res table build costs
more than the halved gather traffic saves. The r4 image_s2d plumbing
changes the economics at k>1: the pooled source can come from the
model's own S2D fold, whose bf16-output form ALREADY exists for the
concat consumers — the cast is CSE'd away, so bf16 sources get the
traffic halving without the relayout. This measures, on the TPU:

  (a) speed: FlowNet2 448x1024 bf16 serving preset (k=2), b1 and b8,
      f32 vs bf16 source;
  (b) accuracy: held-out synthetic AEE of the trained curriculum
      FlowNet2 at k=2, f32/bf16 compute x f32/bf16 source.

Appends "warp_src_ab" to benchmarks/results.json.

Usage: python benchmarks/warp_src_ab.py [--skip_aee] [--skip_speed]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halfres_warp_ab import load_trained_params  # noqa: E402

SRCS = ("float32", "bfloat16")


def measure_speed(params):
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.common import cast_params_for_inference
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    model = get_model("2")
    cast = cast_params_for_inference(params, jnp.bfloat16)
    rng = np.random.RandomState(0)

    out = {}
    for batch in (1, 8):
        a = jnp.asarray(rng.rand(batch, 448, 1024, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(batch, 448, 1024, 3).astype(np.float32))
        # f32 twice: the rerun brackets the noise band
        for src, label in (("float32", "f32"), ("bfloat16", "bf16"),
                           ("float32", "f32_rerun")):
            with dispatch.use_half_res_warp(True), \
                    dispatch.use_warp_source_dtype(src):
                ms = marginal_ms(
                    lambda p, x, y, t: model.apply(
                        p, {"input_a": x + t, "input_b": y},
                        compute_dtype=jnp.bfloat16,
                    )["flow"].mean(),
                    cast, a, b, repeats=3,
                ) / batch
            out[f"b{batch}_{label}"] = round(ms, 3)
            print(f"  b{batch} src={label:10s}: {ms:7.3f} ms/pair",
                  flush=True)
    return out


def measure_aee(params):
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch

    model = get_model("2")
    from ab_common import eval_hw
    eh, ew = eval_hw()
    ds = SyntheticFlowDataset(size=24, height=eh, width=ew, seed=1234)

    def aee(src, dtype):
        cd = jnp.bfloat16 if dtype == "bf16" else None

        @jax.jit
        def fwd(p, a, b):
            return model.apply(
                p, {"input_a": a, "input_b": b}, compute_dtype=cd
            )["flow"]

        total = 0.0
        with dispatch.use_half_res_warp(True), \
                dispatch.use_warp_source_dtype(src):
            for i in range(len(ds)):
                it = ds[i]
                flow = fwd(
                    params,
                    jnp.asarray(it["image_a"])[None],
                    jnp.asarray(it["image_b"])[None],
                )
                err = jnp.sqrt(((flow[0] - it["flow"]) ** 2).sum(-1)).mean()
                total += float(err)
        return total / len(ds)

    out = {}
    for dtype in ("f32", "bf16"):
        for src in SRCS:
            key = f"aee_{dtype}_src_{src}"
            out[key] = aee(src, dtype)
            print(f"  {key}: {out[key]:.5f} px", flush=True)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip_aee", action="store_true")
    parser.add_argument("--skip_speed", action="store_true")
    args = parser.parse_args()

    import jax
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()
    row = {}

    params = load_trained_params()
    row["trained_weights"] = params is not None
    row["curriculum"] = os.environ.get(
        "FLOWNET2_CURRICULUM_NAME", "r3_curriculum")
    if params is None:
        print("no trained checkpoint - using random init", flush=True)
        params = get_model("2").init(jax.random.PRNGKey(0))

    if not args.skip_speed:
        print("== speed (448x1024 bf16 serving preset k=2)", flush=True)
        row["forward_ms"] = measure_speed(params)
    if not args.skip_aee:
        from ab_common import eval_hw
        row["eval_hw"] = "%dx%d" % eval_hw()
        print("== accuracy (held-out synthetic, %s, k=2)"
              % row["eval_hw"], flush=True)
        row.update(measure_aee(params))

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["warp_src_ab"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
