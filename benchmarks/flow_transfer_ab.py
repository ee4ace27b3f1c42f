"""GT-flow host->device transfer dtype A/B (VERDICT r3 weak #3).

The from-disk step gap is pinned on the synchronous ``device_put``
(11.4 ms for the 16.1 MB b8@320x448 batch through the axon relay), and
9.2 MB of that batch is the f32 GT flow — the images already ship
uint8. This A/B runs the SAME deterministic 220-step from-disk training
(synthetic TFRecords, native decoder, no augmentation; the
train_from_disk.py loop) once per ``transfer_flow_dtype`` in
{float32, float16, bfloat16} and reports:

* ms/step (the transfer saving that survives end-to-end), and
* final-weights AEE on a held-out synthetic eval set (the training
  effect of quantizing the TARGETS: f16 ulp at |flow| in [64,128) px
  is 0.0625 px; chairs-scale flows are O(10) px where it is 0.008 px —
  measured, not assumed).

Appends ``flow_transfer`` to benchmarks/results.json.

Usage: python benchmarks/flow_transfer_ab.py [--steps 220] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_variant(tfrecord_path, eval_ds, args, transfer_flow_dtype):
    import jax

    from flownet2_tf_tpu.data.loader import BatchLoader, TFRecordFlowDataset
    from flownet2_tf_tpu.parallel import mesh as mesh_lib
    from flownet2_tf_tpu.training import loop as loop_mod
    from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

    ds = TFRecordFlowDataset(
        tfrecord_path, args.height, args.width, raw_uint8=True
    )
    loader = BatchLoader(ds, batch_size=args.batch, shuffle=True,
                         num_workers=1)
    cfg = TrainConfig(
        model=args.model,
        schedule={
            "name": "bench", "step_values": [10**9],
            "learning_rates": [1e-4, 1e-4], "momentum": 0.9,
            "momentum2": 0.999, "weight_decay": 4e-4, "max_iter": 10**9,
        },
        log_dir=tempfile.mkdtemp(prefix="flow_transfer_"),
        compute_dtype="bfloat16",
        augment=False, tensorboard=False, checkpoint_every=0,
        log_every=10**9,
        transfer_flow_dtype=transfer_flow_dtype,
    )
    trainer = Trainer(cfg)
    state = trainer.init_state()
    step_fn = trainer.get_step_fn(None)
    threaded = loop_mod._use_threaded_prefetch(cfg.device_prefetch)

    batches = loader.batches()
    if transfer_flow_dtype != "float32":
        batches = loop_mod._CastFlowIter(batches, transfer_flow_dtype)
    prefetcher = mesh_lib.DevicePrefetcher(batches, trainer.mesh,
                                           threaded=threaded)
    key = jax.random.PRNGKey(0)
    t0 = None
    n_timed = 0
    try:
        for step, (_, device_batch) in enumerate(prefetcher):
            if step >= args.steps:
                break
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, device_batch, sub)
            if step + 1 == args.warmup:
                jax.block_until_ready(metrics["loss"])
                t0 = time.perf_counter()
            elif step + 1 > args.warmup:
                n_timed += 1
        jax.block_until_ready(metrics["loss"])
        t1 = time.perf_counter()
        final_loss = float(jax.device_get(metrics["loss"]))
    finally:
        prefetcher.close()

    # trained-weights AEE on the held-out eval set (f32 GT — the
    # quantization under test only ever touched the TRAINING targets)
    eval_loader = BatchLoader(eval_ds, batch_size=args.batch,
                              shuffle=False, num_workers=1)
    aee = trainer.evaluate(state, eval_loader, max_batches=8)

    return {
        "ms_per_step": round((t1 - t0) / n_timed * 1000.0, 2),
        "examples_per_sec": round(n_timed * args.batch / (t1 - t0), 1),
        "final_loss": round(final_loss, 4),
        "eval_aee_px": round(float(aee), 4),
        "staging": "thread" if threaded else "inline",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=220)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--examples", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=448)
    ap.add_argument("--model", default="s")
    ap.add_argument("--dtypes", default="float32,float16,bfloat16")
    args = ap.parse_args()

    import jax

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache
    from flownet2_tf_tpu.tools.make_tfrecords import write_dataset

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)

    eval_ds = SyntheticFlowDataset(size=64, height=args.height,
                                   width=args.width, seed=99)
    rows = {}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "train.tfrecords")
        write_dataset(
            SyntheticFlowDataset(size=args.examples, height=args.height,
                                 width=args.width, seed=0),
            path, log_every=0,
        )
        for dt in args.dtypes.split(","):
            rows[dt] = run_variant(path, eval_ds, args, dt)
            print(f"  {dt}: {json.dumps(rows[dt])}", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["flow_transfer"] = {
        "model": args.model, "batch": args.batch,
        "height": args.height, "width": args.width,
        "steps": args.steps, **rows,
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
