"""bf16-interconv A/B (r3 serving-profile follow-up).

The r3 serving-preset profile's single largest async copy is FlowNetSD
``interconv5`` — a (3,3,1026,512) float32 weight (18.9 MB) streamed
every forward, because the unactivated interconv refinements share the
flow heads' f32 treatment while being FEATURE-scale layers
(dispatch.get_bf16_interconv). This measures both sides of letting
interconvs follow the bf16 policy, on the TPU:

  (a) speed: FlowNet2 + FlowNetSD 448x1024 b1 forward under the
      serving preset (pre-cast params, half-res warps for FN2), with
      f32 vs bf16 interconvs;
  (b) accuracy: held-out synthetic AEE of the trained curriculum
      FlowNet2 (logs/r3_curriculum/2), f32/bf16 x interconv off/on.

Usage: python benchmarks/interconv_ab.py [--skip_aee] [--skip_speed]
Appends "interconv_ab" to benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halfres_warp_ab import load_trained_params  # noqa: E402


def measure_speed():
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.common import cast_params_for_inference
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))

    out = {}
    for model_name in ("sd", "2"):
        model = get_model(model_name)
        params = model.init(jax.random.PRNGKey(0))
        for bf16_ic in (False, True, False):
            tag = "bf16_ic" if bf16_ic else (
                "f32_ic" if f"{model_name}_f32_ic" not in out
                else "f32_ic_rerun"
            )
            with contextlib.ExitStack() as stack:
                stack.enter_context(dispatch.use_bf16_interconv(bf16_ic))
                if model_name == "2":
                    # serving preset pairs with half-res warps
                    stack.enter_context(dispatch.use_half_res_warp(True))
                p = cast_params_for_inference(params, jnp.bfloat16)
                ms = marginal_ms(
                    lambda p, x, y, t: model.apply(
                        p, {"input_a": x + t, "input_b": y},
                        compute_dtype=jnp.bfloat16,
                    )["flow"].mean(),
                    p, a, b, repeats=3,
                )
            out[f"{model_name}_{tag}"] = ms
            print(f"  {model_name:2s} {tag:12s}: {ms:7.3f} ms/pair",
                  flush=True)
    return out


def measure_aee(params):
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch

    model = get_model("2")
    # held-out seed (training used seed=7)
    from ab_common import eval_hw
    eh, ew = eval_hw()
    ds = SyntheticFlowDataset(size=24, height=eh, width=ew, seed=1234)

    def aee(bf16_ic, dtype):
        cd = jnp.bfloat16 if dtype == "bf16" else None

        @jax.jit
        def fwd(p, a, b):
            return model.apply(
                p, {"input_a": a, "input_b": b}, compute_dtype=cd
            )["flow"]

        total = 0.0
        with dispatch.use_bf16_interconv(bf16_ic):
            for i in range(len(ds)):
                it = ds[i]
                flow = fwd(
                    params,
                    jnp.asarray(it["image_a"])[None],
                    jnp.asarray(it["image_b"])[None],
                )
                err = jnp.sqrt(
                    ((flow[0] - it["flow"]) ** 2).sum(-1)
                ).mean()
                total += float(err)
        return total / len(ds)

    out = {}
    for dtype in ("f32", "bf16"):
        for bf16_ic in (False, True):
            key = f"aee_{dtype}_{'bf16ic' if bf16_ic else 'f32ic'}"
            out[key] = aee(bf16_ic, dtype)
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
        print("== speed (448x1024 b1, serving preset)", flush=True)
        row["forward_ms"] = measure_speed()
    if not args.skip_aee:
        from ab_common import eval_hw
        row["eval_hw"] = "%dx%d" % eval_hw()
        print("== accuracy (held-out synthetic, %s)"
              % row["eval_hw"], flush=True)
        row.update(measure_aee(params))

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["interconv_ab"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
