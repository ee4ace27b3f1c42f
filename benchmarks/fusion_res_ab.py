"""Half-resolution fusion-net A/B (VERDICT r4 #4 — "change WHAT is
computed" for serving).

The fusion network's input assembly and level-0 chain run at full
448x1024 with 2-16 output channels: lane-starved shapes that sit at
<15% of the MXU roofline and cost the same per pair at b1 and b8 (op
ledger). ``dispatch.use_fusion_res(2)`` runs the whole fusion pyramid
on a half-resolution assembly (models/stacks.py::_fusion_input_halfres)
and resizes only the final flow back up — quartering that work. This
measures both sides on top of the adopted serving preset (bf16 +
half-res stack warps):

  (a) speed: FlowNet2 448x1024 bf16 end-to-end, b1 and b8,
      fusion_res 1 vs 2 (marginal_ms, scan-chained);
  (b) accuracy: held-out synthetic AEE of the trained curriculum
      FlowNet2, fusion_res 1 vs 2, f32-exact-warps (isolates the
      fusion-res delta) and the full serving preset.

Appends "fusion_res_ab" to benchmarks/results.json.
Usage: python benchmarks/fusion_res_ab.py [--skip_aee] [--skip_speed]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ab_common import curriculum_name, eval_hw  # noqa: E402


def ckpt_dir():
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "logs",
                     curriculum_name(), "2")
    )


def load_trained_params():
    import orbax.checkpoint as ocp

    path = os.path.join(ckpt_dir(), "checkpoints")
    if not os.path.isdir(path):
        return None
    mgr = ocp.CheckpointManager(path)
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step)["params"]


def measure_speed(params):
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    model = get_model("2")
    rng = np.random.RandomState(0)
    out = {}
    for batch in (1, 8):
        a = jnp.asarray(rng.rand(batch, 448, 1024, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(batch, 448, 1024, 3).astype(np.float32))
        # k1 rerun last: catches drift/contention within the sweep
        for k in (1, 2, 1):
            label = f"b{batch}_k{k}"
            if label in out:
                label += "_rerun"
            with dispatch.use_half_res_warp(True), \
                 dispatch.use_fusion_res(k):
                ms = marginal_ms(
                    lambda p, x, y, t: model.apply(
                        p, {"input_a": x + t, "input_b": y},
                        compute_dtype=jnp.bfloat16,
                    )["flow"].mean(),
                    params, a, b, repeats=3,
                ) / batch
            out[label] = round(ms, 3)
            print(f"  forward {label:12s}: {ms:7.3f} ms/pair", flush=True)
    return out


def measure_aee(params):
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch

    model = get_model("2")
    eh, ew = eval_hw()
    # held-out seed (training used seed=7)
    ds = SyntheticFlowDataset(size=24, height=eh, width=ew, seed=1234)

    def aee(fusion_k, preset):
        cd = jnp.bfloat16 if preset else None

        @jax.jit
        def fwd(p, a, b):
            return model.apply(
                p, {"input_a": a, "input_b": b}, compute_dtype=cd
            )["flow"]

        import contextlib

        stack = contextlib.ExitStack()
        stack.enter_context(dispatch.use_fusion_res(fusion_k))
        if preset:
            stack.enter_context(dispatch.use_half_res_warp(True))
        total = 0.0
        with stack:
            for i in range(len(ds)):
                it = ds[i]
                flow = fwd(params, jnp.asarray(it["image_a"])[None],
                           jnp.asarray(it["image_b"])[None])
                total += float(jnp.sqrt(
                    ((flow[0] - it["flow"]) ** 2).sum(-1)).mean())
        return total / len(ds)

    out = {}
    for preset in (False, True):
        tag = "preset_bf16_halfwarp" if preset else "exact_f32"
        for k in (1, 2):
            key = f"aee_{tag}_fusion_k{k}"
            out[key] = round(aee(k, preset), 5)
            print(f"  {key}: {out[key]:.5f} px", flush=True)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip_aee", action="store_true")
    parser.add_argument("--skip_speed", action="store_true")
    args = parser.parse_args()

    import jax

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.tools.arbiter import tpu_lock
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()
    row = {}
    params = load_trained_params()
    row["trained_weights"] = params is not None
    row["curriculum"] = curriculum_name()
    if params is None:
        print("no trained checkpoint at", ckpt_dir(),
              "- using random init", flush=True)
        params = get_model("2").init(jax.random.PRNGKey(0))

    with tpu_lock(label="fusion_res_ab"):
        if not args.skip_speed:
            print("== speed (448x1024 bf16, serving half-warps)",
                  flush=True)
            row["forward_ms"] = measure_speed(params)
        if not args.skip_aee:
            row["eval_hw"] = "%dx%d" % eval_hw()
            print("== accuracy (held-out synthetic, %s)" % row["eval_hw"],
                  flush=True)
            row.update(measure_aee(params))

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    try:
        with open(out_path) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}
    results["fusion_res_ab"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
