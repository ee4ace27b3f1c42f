"""Host input-pipeline throughput proof (VERDICT r2 missing #2).

The device side demands ~600 examples/sec at the reference crop
(FlowNetS b8 @320x448 trains at ~13.4 ms/step). Every prior on-device
training run fed from the in-memory synthetic dataset; this bench
measures what the real on-disk path sustains:

  TFRecord file -> BatchLoader (threaded prefetch) -> stacked batches
  via (a) the native C++ decoder (runtime/native_io.cc fetch_batch) and
  (b) the pure-Python codec fallback.

Host-only — no TPU required (and safe to run while the chip is busy).

Usage: python benchmarks/input_pipeline.py [--examples 512] [--batch 8]
Appends an "input_pipeline" row to benchmarks/results.json.
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


def make_synthetic_tfrecords(path, n, height, width):
    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.tools.make_tfrecords import write_dataset

    ds = SyntheticFlowDataset(size=n, height=height, width=width, seed=0)
    return write_dataset(ds, path, log_every=0)


def measure_loader(path, height, width, batch, use_native, n_batches,
                   num_workers=4, raw_uint8=False):
    from flownet2_tf_tpu.data.loader import BatchLoader, TFRecordFlowDataset

    ds = TFRecordFlowDataset(path, height, width, use_native=use_native,
                             raw_uint8=raw_uint8)
    native_active = getattr(ds, "_native_handle", None) is not None
    loader = BatchLoader(ds, batch_size=batch, shuffle=True,
                         num_workers=num_workers)
    it = loader.batches()
    try:
        # warm up: first batch pays index build + thread spin-up
        first = next(it)
        assert first["image_a"].shape == (batch, height, width, 3)
        assert first["flow"].shape == (batch, height, width, 2)
        assert first["image_a"].dtype == (
            np.uint8 if raw_uint8 else np.float32
        )

        t0 = time.perf_counter()
        for _ in range(n_batches):
            b = next(it)
        t1 = time.perf_counter()
        # be explicit that decode really happened
        assert np.isfinite(b["flow"]).all()
    finally:
        it.close()  # stop the producer thread before the tempdir dies
    dt = t1 - t0
    return {
        "native_decoder": bool(native_active),
        "raw_uint8": bool(raw_uint8),
        "batches": n_batches,
        "examples_per_sec": n_batches * batch / dt,
        "ms_per_batch": dt / n_batches * 1000.0,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--examples", type=int, default=512)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--height", type=int, default=320)
    parser.add_argument("--width", type=int, default=448)
    parser.add_argument("--batches", type=int, default=150)
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args()

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.tfrecords")
        print(f"writing {args.examples} synthetic examples "
              f"@{args.height}x{args.width} ...", flush=True)
        n = make_synthetic_tfrecords(path, args.examples, args.height,
                                     args.width)
        size_mb = os.path.getsize(path) / 1e6
        print(f"  {n} examples, {size_mb:.0f} MB", flush=True)

        rows = {}
        for use_native in (True, False):
            for raw_uint8 in (True, False):
                label = ("native" if use_native else "python") + (
                    "_u8" if raw_uint8 else "_f32"
                )
                r = measure_loader(path, args.height, args.width,
                                   args.batch, use_native, args.batches,
                                   args.workers, raw_uint8=raw_uint8)
                rows[label] = r
                print(f"  {label:11s} decode: {r['examples_per_sec']:8.1f} "
                      f"examples/sec ({r['ms_per_batch']:.1f} ms/batch, "
                      f"native_active={r['native_decoder']})", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["input_pipeline"] = {
        "batch": args.batch,
        "height": args.height,
        "width": args.width,
        "num_workers": args.workers,
        **{k: v for k, v in rows.items()},
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
