"""Half-resolution stack-warp A/B (VERDICT r2 next-round #2).

The full-res warp gather is issue-rate-bound in XLA's gather emitter
(~4.5 ns/record — docs/DESIGN.md), so halving the coordinate grid cuts
its cost ~4x. ops/flow_warp.py::flow_warp_half implements it (2x2 area
pool + grid-offset-corrected half flow + TF1 bilinear upsample), gated
by dispatch.use_half_res_warp. This measures BOTH sides of the trade on
the TPU:

  (a) speed: FlowNet2 448x1024 b1 bf16 end-to-end forward, full vs
      half warps (marginal_ms, scan-chained);
  (b) accuracy: held-out synthetic AEE of the trained curriculum
      FlowNet2 (logs/r3_curriculum/2) with full vs half warps, f32 and
      bf16 — the numerics change is only acceptable if the trained-
      weights AEE delta is small.

Requires benchmarks/curriculum_train.py to have populated
logs/r3_curriculum for part (b); part (a) runs on random init too.

Usage: python benchmarks/halfres_warp_ab.py [--skip_aee]
Appends "halfres_warp" to benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CKPT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "logs",
                 os.environ.get("FLOWNET2_CURRICULUM_NAME",
                                "r3_curriculum"),
                 "2")
)


def load_trained_params():
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.join(CKPT, "checkpoints"))
    step = mgr.latest_step()
    if step is None:
        return None
    # restore params only (opt_state shape depends on the optimizer)
    restored = mgr.restore(step)
    return restored["params"]


def measure_speed(params):
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    model = get_model("2")
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))

    out = {}
    for mode in (False, True, False):
        label = "half" if mode else ("full" if "full" not in out
                                     else "full_rerun")
        with dispatch.use_half_res_warp(mode):
            ms = marginal_ms(
                lambda p, x, y, t: model.apply(
                    p, {"input_a": x + t, "input_b": y},
                    compute_dtype=jnp.bfloat16,
                )["flow"].mean(),
                params, a, b, repeats=3,
            )
        out[label] = ms
        print(f"  forward {label:10s}: {ms:7.3f} ms/pair", flush=True)
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

    def aee(half, dtype):
        cd = jnp.bfloat16 if dtype == "bf16" else None

        @jax.jit
        def fwd(p, a, b):
            return model.apply(
                p, {"input_a": a, "input_b": b}, compute_dtype=cd
            )["flow"]

        total = 0.0
        with dispatch.use_half_res_warp(half):
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
        for half in (False, True):
            key = f"aee_{dtype}_{'half' if half else 'full'}"
            out[key] = aee(half, dtype)
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
        print("no trained checkpoint at", CKPT, "- using random init",
              flush=True)
        params = get_model("2").init(jax.random.PRNGKey(0))

    if not args.skip_speed:
        print("== speed (448x1024 b1 bf16)", flush=True)
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
    results["halfres_warp"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
