"""Training-path warp-res A/B: does the serving half-res warp win
transfer to TRAINING?

The serving preset's half-res stack warps (k=2) bought 1.55x forward
for an AEE delta within +-0.011 px on trained weights (sign is
curriculum-dependent — docs/DESIGN.md). Training is a
different question twice over: (1) the train step's warp share differs
(b8 at the 320x448 reference crop, backward pass included), and (2)
coarse warps change the GRADIENTS — the fusion/stacked stages would be
trained on an approximation of their own inputs. This measures both:

Part 1 — step time. The full jitted DP train step (b8 @320x448 bf16,
reference crop) for the warp-bearing stacks cs/css/2, exact (k=1) vs
half-res (k=2) warps via ``dispatch.use_warp_res``.

Part 2 — convergence. Fine-tune the FlowNet2 fusion stage from the
r3_curriculum CSS+SD warm start (the reference's own staging, SURVEY
§3.3), same data/seed/steps in both arms, once with exact warps and
once with k=2. Both arms are then evaluated with EXACT warps in f32 on
held-out scenes (training seed 7, eval seed 1234 — disjoint): the
question is whether gradients through coarse warps train an equally
good net for exact-warp deployment. An eval under k=2 is also recorded
for the train-coarse/serve-coarse pairing.

Appends ``train_warp_res`` to benchmarks/results.json.

Usage: python benchmarks/train_warp_res_ab.py [--skip_steps]
           [--skip_converge] [--steps 400]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOGS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "logs")
)
CURRICULUM = os.path.join(LOGS, "r3_curriculum")


def bench_steps(results):
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import train_step_ms

    print("== train-step warp-res A/B (b8 @320x448, bf16)", flush=True)
    rows = {}
    for model in ("cs", "css", "2"):
        for k in (1, 2):
            with dispatch.use_warp_res(k):
                ms, eps = train_step_ms(
                    model, batch=8, height=320, width=448, iters=6,
                )
            rows[f"{model}_k{k}"] = {
                "model": model, "warp_res": k, "batch": 8,
                "ms_per_step": round(ms, 2),
                "examples_per_sec": round(eps, 1),
            }
            print(f"   {model:3s} k={k}: {ms:7.2f} ms/step "
                  f"({eps:.1f} ex/s)", flush=True)
    results.setdefault("train_warp_res", {})["steps"] = rows


def finetune_fusion(k, steps, log_dir):
    """One fine-tune arm: fusion stage from the CSS+SD warm start,
    synthetic scenes seed 7 (the curriculum's own recipe), warps at
    grid factor k during training."""
    from flownet2_tf_tpu.data.loader import BatchLoader, SyntheticFlowDataset
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

    cfg = TrainConfig(
        model="2",
        schedule={
            "name": "warp-res-ab",
            "step_values": [max(1, steps // 2)],
            "learning_rates": [1e-4, 5e-5],
            "momentum": 0.9,
            "momentum2": 0.999,
            "weight_decay": 4e-4,
            "max_iter": steps,
        },
        log_dir=log_dir,
        compute_dtype="bfloat16",
        augment=False,
        tensorboard=False,
        checkpoint_every=steps,
        log_every=100,
        eval_every=0,
    )
    trainer = Trainer(cfg)
    ds = SyntheticFlowDataset(size=256, height=192, width=256, seed=7,
                              cache=True, uint8_images=True)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, num_workers=1)
    warm = {
        os.path.join(CURRICULUM, "css"): ("", "FlowNetCSS"),
        os.path.join(CURRICULUM, "sd"): ("", "FlowNetSD"),
    }
    t0 = time.time()
    with dispatch.use_warp_res(k):
        state = trainer.fit(loader, max_steps=steps,
                            warm_start_checkpoints=warm)
    dt = time.time() - t0
    print(f"   arm k={k}: {steps} steps in {dt:.0f}s", flush=True)
    return state["params"], dt


def eval_aee(params, eval_k, pairs=24):
    """Held-out AEE, f32, warps at grid factor eval_k."""
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch

    model = get_model("2")
    ds = SyntheticFlowDataset(size=pairs, height=192, width=256, seed=1234)

    @jax.jit
    def fwd(p, a, b):
        return model.apply(
            p, {"input_a": a, "input_b": b}, compute_dtype=None
        )["flow"]

    total = 0.0
    with dispatch.use_warp_res(eval_k):
        for i in range(len(ds)):
            s = ds[i]
            flow = fwd(params, jnp.asarray(s["image_a"])[None],
                       jnp.asarray(s["image_b"])[None])
            err = jnp.sqrt(((flow[0] - s["flow"]) ** 2).sum(-1)).mean()
            total += float(err)
    return total / len(ds)


def bench_convergence(results, steps):
    for stage in ("css", "sd"):
        if not os.path.isdir(os.path.join(CURRICULUM, stage)):
            print(f"!! no {CURRICULUM}/{stage} checkpoint — run "
                  "benchmarks/curriculum_train.py first; skipping "
                  "convergence arm", flush=True)
            return
    print(f"== fusion fine-tune convergence A/B ({steps} steps "
          "@192x256 b8)", flush=True)
    rows = {"steps": steps, "train_seed": 7, "eval_seed": 1234}
    for k in (1, 2):
        log_dir = f"/tmp/flownet2_warp_res_ab_k{k}"
        shutil.rmtree(log_dir, ignore_errors=True)
        params, dt = finetune_fusion(k, steps, log_dir)
        row = {
            "train_seconds": round(dt, 1),
            "aee_eval_exact": round(eval_aee(params, 1), 5),
            "aee_eval_k2": round(eval_aee(params, 2), 5),
        }
        rows[f"train_k{k}"] = row
        print(f"   train k={k}: exact-eval AEE {row['aee_eval_exact']:.5f}"
              f" px, k2-eval AEE {row['aee_eval_k2']:.5f} px", flush=True)
    results.setdefault("train_warp_res", {})["convergence"] = rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip_steps", action="store_true")
    parser.add_argument("--skip_converge", action="store_true")
    parser.add_argument("--steps", type=int, default=400)
    args = parser.parse_args()

    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()
    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)

    if not args.skip_steps:
        bench_steps(results)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, default=str)
    if not args.skip_converge:
        bench_convergence(results, args.steps)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
