"""Stack-warp grid-factor A/B: k = 1 (exact) / 2 (half) / 4 (quarter).

Follow-up to the adopted half-res serving preset (halfres_warp_ab.py):
the warp gather is issue-rate-bound, so k=4 cuts the remaining gather
cost 4x again — but pooling/upsample overheads and accuracy decide
whether it pays. Measures on the TPU:

  (a) speed: FlowNet2 448x1024 b1 bf16 end-to-end forward at each k
      (marginal_ms, scan-chained, serving-style pre-cast params);
  (b) accuracy: held-out synthetic AEE of the trained curriculum
      FlowNet2 (logs/r3_curriculum/2) at each k, f32 and bf16.

Appends "warp_res_ab" to benchmarks/results.json.

Usage: python benchmarks/warp_res_ab.py [--skip_aee] [--skip_speed]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halfres_warp_ab import load_trained_params  # noqa: E402

KS = (1, 2, 4)


def measure_speed(params):
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.common import cast_params_for_inference
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    model = get_model("2")
    cast = cast_params_for_inference(params, jnp.bfloat16)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))

    out = {}
    # k=2 twice: the rerun brackets the noise band of the headline
    for k, label in ((1, "k1"), (2, "k2"), (4, "k4"), (2, "k2_rerun")):
        with dispatch.use_warp_res(k):
            ms = marginal_ms(
                lambda p, x, y, t: model.apply(
                    p, {"input_a": x + t, "input_b": y},
                    compute_dtype=jnp.bfloat16,
                )["flow"].mean(),
                cast, a, b, repeats=3,
            )
        out[label] = round(ms, 3)
        print(f"  forward {label:9s}: {ms:7.3f} ms/pair", flush=True)
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

    def aee(k, dtype):
        cd = jnp.bfloat16 if dtype == "bf16" else None

        @jax.jit
        def fwd(p, a, b):
            return model.apply(
                p, {"input_a": a, "input_b": b}, compute_dtype=cd
            )["flow"]

        total = 0.0
        with dispatch.use_warp_res(k):
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
        for k in KS:
            key = f"aee_{dtype}_k{k}"
            out[key] = aee(k, dtype)
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
        print("== speed (448x1024 b1 bf16, pre-cast params)", flush=True)
        row["forward_ms"] = measure_speed(params)
    if not args.skip_aee:
        from ab_common import eval_hw
        row["eval_hw"] = "%dx%d" % eval_hw()
        print("== accuracy (held-out synthetic, %s)"
              % row["eval_hw"], flush=True)
        row.update(measure_aee(params))

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["warp_res_ab"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
