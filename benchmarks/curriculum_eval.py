"""Held-out AEE for every trained curriculum stage, per run directory.

Evaluates each stage checkpoint under logs/<run>/<stage> on held-out
synthetic scenes (seed disjoint from the training seed), f32 exact
path, AEE reduced on device. Used to compare curriculum variants
(e.g. r3_curriculum 192x256/no-aug vs r3_curriculum_long 192x256
crop/full Chairs augmentation/3x steps).

Usage: python benchmarks/curriculum_eval.py [--runs r3_curriculum,
r3_curriculum_long] [--stages c,cs,css,sd,2]
Appends "curriculum_eval" to benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOGS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "logs")
)

STAGE_MODEL = {"c": "c", "cs": "cs", "css": "css", "sd": "sd", "2": "2",
               "s": "s"}


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
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", default="r3_curriculum,r3_curriculum_long")
    parser.add_argument("--stages", default="c,cs,css,sd,2")
    parser.add_argument("--pairs", type=int, default=24)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.tools.arbiter import tpu_lock
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()
    # held-out: training used seed=7; resolution follows the curriculum
    # crop via FLOWNET2_AB_EVAL_HW (ab_common.eval_hw)
    from ab_common import eval_hw

    eh, ew = eval_hw()
    ds = SyntheticFlowDataset(size=args.pairs, height=eh, width=ew,
                              seed=1234)
    scenes = [ds[i] for i in range(len(ds))]

    import contextlib

    rows = {}
    # hold the device for the whole eval sweep (script exits right
    # after, so process-lifetime scope is the honest scope here)
    stack = contextlib.ExitStack()
    stack.enter_context(tpu_lock(label="curriculum_eval"))
    for run in args.runs.split(","):
        run = run.strip()
        for stage in args.stages.split(","):
            stage = stage.strip()
            loaded = load_stage(run, stage)
            if loaded is None:
                print(f"  {run}/{stage}: no checkpoint, skipped",
                      flush=True)
                continue
            params, step = loaded
            model = get_model(STAGE_MODEL[stage])

            @jax.jit
            def fwd(p, a, b):
                return model.apply(
                    p, {"input_a": a, "input_b": b}, compute_dtype=None
                )["flow"]

            total = 0.0
            for s in scenes:
                flow = fwd(params, jnp.asarray(s["image_a"])[None],
                           jnp.asarray(s["image_b"])[None])
                err = jnp.sqrt(((flow[0] - s["flow"]) ** 2).sum(-1)).mean()
                total += float(err)
            aee = total / len(scenes)
            rows[f"{run}/{stage}"] = {"aee": round(aee, 5), "step": step,
                                      "eval_hw": f"{eh}x{ew}",
                                      "pairs": args.pairs}
            print(f"  {run}/{stage} @step {step}: AEE {aee:.5f} px",
                  flush=True)

    stack.close()  # device work done; release before the file merge
    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    # no section-level height/width header (ADVICE r4): rows from
    # different eval resolutions coexist, so each row carries its own
    # eval_hw/pairs; drop any stale header fields from older writers
    section = results.setdefault("curriculum_eval", {})
    for stale in ("pairs", "height", "width"):
        section.pop(stale, None)
    section["compute_dtype"] = "float32"
    section.update(rows)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
