"""Train the full reference curriculum on-device and PERSIST the weights.

Round-2 trained every stage in temp dirs, so no trained checkpoints
survived for measurement work (VERDICT r3 needs trained weights for the
half-res-warp AEE delta, the spatial seam table, and the f32 parity
probe). This runs the reference staging — C -> CS -> CSS, SD, fusion
warm-started from CSS+SD (reference src/flownet_*/train.py checkpoints
dicts, SURVEY §3.3) — on the synthetic dataset at 192x256 b8, a few
hundred steps per stage, checkpoints under logs/r3_curriculum/<stage>.

Also trains a standalone FlowNetS (800 steps @320x448) for the spatial
seam experiments.

Usage: python benchmarks/curriculum_train.py [--stages c,cs,css,sd,2,s]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOG_ROOT = os.path.join(os.path.dirname(__file__), "..", "logs",
                        os.environ.get("FLOWNET2_CURRICULUM_NAME",
                                       "r3_curriculum"))

STAGES = {
    # name: (model, steps, warm_starts [(src_stage, src_scope, dst_scope)])
    "c": ("c", 600, []),
    "cs": ("cs", 600, [("c", "", "FlowNetC")]),
    "css": ("css", 400, [("cs", "", "FlowNetCS")]),
    "sd": ("sd", 600, []),
    "2": ("2", 400, [("css", "", "FlowNetCSS"), ("sd", "", "FlowNetSD")]),
    # standalone FlowNetS at the reference crop for seam experiments
    "s": ("s", 800, []),
}


def stage_dir(name):
    return os.path.abspath(os.path.join(LOG_ROOT, name))


def train_stage(name, height, width, steps_scale=1, augment=False,
                motion="default", steps_override=None,
                checkpoint_every=None):
    from flownet2_tf_tpu.data.loader import BatchLoader, SyntheticFlowDataset
    from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

    model, steps, warms = STAGES[name]
    steps = (steps_override if steps_override is not None
             else steps * steps_scale)
    if name == "s":
        height, width = 320, 448
    log_dir = stage_dir(name)
    cfg = TrainConfig(
        model=model,
        schedule={
            "name": "curriculum",
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
        # default: one save at the end (+ final save); long stages pass
        # a smaller interval so a timeout/reboot mid-stage resumes from
        # the last interval instead of restarting the stage (the r5
        # reboots cost two full retrains this way)
        checkpoint_every=(checkpoint_every or steps),
        log_every=100,
        eval_every=0,
    )
    cfg.augment = bool(augment)
    preprocess = None
    if augment:
        # the Chairs augmentation recipe at the training crop: source
        # frames are rendered crop+64 so the spatial transforms have
        # real borders to sample
        import copy as _copy

        from flownet2_tf_tpu.data.dataset_configs import (
            FLYING_CHAIRS_DATASET_CONFIG,
        )

        preprocess = _copy.deepcopy(
            FLYING_CHAIRS_DATASET_CONFIG["PREPROCESS"]
        )
        preprocess["crop_height"] = height
        preprocess["crop_width"] = width
    trainer = Trainer(cfg)
    src_h = height + (64 if augment else 0)
    src_w = width + (64 if augment else 0)
    # cache=True: the single host core renders ~12 ex/s live, starving
    # the device; 256 memoized scenes rebalance it to device-bound.
    # uint8 images: what real datasets are, and 4x less per-step
    # host->device transfer through the axon relay
    ds = SyntheticFlowDataset(size=256, height=src_h, width=src_w, seed=7,
                              cache=True, uint8_images=True, motion=motion)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, num_workers=1)

    warm = {}
    for src_stage, src_scope, dst_scope in warms:
        warm[stage_dir(src_stage)] = (src_scope, dst_scope)

    t0 = time.time()
    state = trainer.fit(loader, preprocess=preprocess, max_steps=steps,
                        warm_start_checkpoints=warm or None)
    dt = time.time() - t0
    print(f"stage {name}: {steps} steps in {dt:.0f}s "
          f"({steps / dt:.1f} steps/s) -> {log_dir}", flush=True)
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stages", default="c,cs,css,sd,2,s")
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--steps_scale", type=int, default=1,
                        help="multiply every stage's step budget")
    parser.add_argument("--steps", default="",
                        help="per-stage absolute step overrides, e.g. "
                             "'c=2400,2=1600' (resuming runs continue "
                             "from their checkpoint to the new total)")
    parser.add_argument("--augment", action="store_true",
                        help="full Chairs augmentation at the crop "
                             "(source frames rendered crop+64)")
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="save every N steps (0 = once per stage); "
                             "use for long stages that must survive a "
                             "timeout or host reboot mid-stage")
    parser.add_argument("--motion", default="default",
                        choices=["default", "large", "subpixel", "mixed"],
                        help="synthetic displacement regime (the fusion "
                             "study trains on 'mixed')")
    args = parser.parse_args()

    from flownet2_tf_tpu.tools.arbiter import tpu_lock
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()
    overrides = {}
    for kv in args.steps.split(","):
        if kv.strip():
            k, v = kv.split("=")
            overrides[k.strip()] = int(v)
    os.makedirs(LOG_ROOT, exist_ok=True)
    timings = {}
    with tpu_lock(label="curriculum_train"):
        for name in args.stages.split(","):
            name = name.strip()
            if not name:
                continue
            timings[name] = train_stage(
                name, args.height, args.width,
                steps_scale=args.steps_scale, augment=args.augment,
                motion=args.motion, steps_override=overrides.get(name),
                checkpoint_every=args.checkpoint_every or None,
            )
            # persist per stage: a later stage dying must not lose the
            # earlier stages' wall-clock record (VERDICT r4 #5)
            with open(os.path.join(LOG_ROOT, "timings.json"), "w") as f:
                json.dump(timings, f, indent=2)
    print("done:", json.dumps(timings))


if __name__ == "__main__":
    main()
