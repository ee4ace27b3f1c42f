"""Vindicate or indict the FlowNet2 fusion stage (VERDICT r4 #2).

The fusion network exists to arbitrate between the CSS branch (strong
on large displacement via correlation) and the SD branch (strong on
sub-pixel motion) — FlowNet2 paper §4. The r4 curriculum trained it on
a displacement distribution with NO regime separation (translation
~U(-5,5) px) and only 400 steps, and it *degraded* its CSS input
(1.798 vs 0.766 px AEE) — the one empirical signal on the
survey-reconstructed fusion spec pointed the wrong way.

This script is the accuracy side of the experiment: it evaluates the
css / sd / 2 checkpoints of a curriculum run on three held-out subsets
— 'large' (|t| in [10,40] px), 'subpixel' (|t| <= 0.9 px), and their
union 'mixed' — and records whether fusion beats min(CSS, SD) where it
is supposed to: on the mixed set. The training side is
curriculum_train.py --motion mixed with the fusion stage at >=1200
steps.

Appends results.json::fusion_value:
  {run: {eval_hw, per-subset {css, sd, 2} AEE, fusion_beats_min_branch}}

Usage: python benchmarks/fusion_value.py --run r5_mixed_320x448
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ab_common import curriculum_name, eval_hw  # noqa: E402

LOGS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "logs")
)
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")

# held-out seeds, disjoint from the training seed (7) and the
# curriculum_eval seed (1234)
SUBSET_SEEDS = {"large": 4321, "subpixel": 8765}


def load_stage(run, stage):
    import orbax.checkpoint as ocp

    path = os.path.join(LOGS, run, stage, "checkpoints")
    if not os.path.isdir(path):
        return None
    mgr = ocp.CheckpointManager(path)
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step)["params"], step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None,
                    help="logs/<run> curriculum (default: "
                         "FLOWNET2_CURRICULUM_NAME)")
    ap.add_argument("--pairs", type=int, default=16,
                    help="eval pairs PER SUBSET")
    ap.add_argument("--stages", default="css,sd,2")
    args = ap.parse_args()
    run = args.run or curriculum_name()

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.tools.arbiter import tpu_lock
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()
    eh, ew = eval_hw()
    subsets = {}
    for name, seed in SUBSET_SEEDS.items():
        ds = SyntheticFlowDataset(size=args.pairs, height=eh, width=ew,
                                  seed=seed, motion=name)
        subsets[name] = [ds[i] for i in range(len(ds))]

    stages = [s.strip() for s in args.stages.split(",")]
    table = {}
    with tpu_lock(label="fusion_value"):
        for stage in stages:
            loaded = load_stage(run, stage)
            if loaded is None:
                print(f"  {run}/{stage}: no checkpoint, skipped",
                      flush=True)
                continue
            params, step = loaded
            model = get_model(stage)

            @jax.jit
            def fwd(p, a, b):
                return model.apply(
                    p, {"input_a": a, "input_b": b}, compute_dtype=None
                )["flow"]

            per_subset = {}
            for name, scenes in subsets.items():
                total = 0.0
                for s in scenes:
                    flow = fwd(params, jnp.asarray(s["image_a"])[None],
                               jnp.asarray(s["image_b"])[None])
                    err = jnp.sqrt(
                        ((flow[0] - s["flow"]) ** 2).sum(-1)
                    ).mean()
                    total += float(err)
                per_subset[name] = round(total / len(scenes), 5)
            per_subset["mixed"] = round(
                sum(per_subset[n] for n in SUBSET_SEEDS)
                / len(SUBSET_SEEDS), 5)
            per_subset["step"] = step
            table[stage] = per_subset
            print(f"  {run}/{stage} @step {step}: " + ", ".join(
                f"{k} {v}" for k, v in per_subset.items()), flush=True)

    row = {"eval_hw": f"{eh}x{ew}", "pairs_per_subset": args.pairs,
           "compute_dtype": "float32", **table}
    if "2" in table and "css" in table and "sd" in table:
        min_branch = min(table["css"]["mixed"], table["sd"]["mixed"])
        row["min_branch_mixed"] = min_branch
        row["fusion_beats_min_branch"] = bool(
            table["2"]["mixed"] <= min_branch)
    try:
        with open(RESULTS) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}
    results.setdefault("fusion_value", {})[run] = row
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", RESULTS)


if __name__ == "__main__":
    main()
