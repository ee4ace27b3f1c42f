"""Round-3 measurement tasks (VERDICT r2 #4 and #5), run on the TPU:

1. IN-MODEL correlation implementation A/B: FlowNetC 448x1024 b1 bf16
   end-to-end forward time with each of oracle/mxu/pallas forced via
   ops.dispatch — the isolated "ops" sweep and the docstrings disagreed
   (pallas 0.97 < mxu 1.09 < oracle 1.25 ms isolated), and this repo's
   own lesson is that isolated microbenches mislead in-model.
2. Deep-stack train-step benches at the reference crop (320x448 b8):
   FlowNetCSS and FlowNet2 (fusion-stage training), remat off and on.

Appends results into benchmarks/results.json.

Usage: python benchmarks/r3_tasks.py [--skip_corr] [--skip_train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip_corr", action="store_true")
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--models", default="css,2",
                        help="comma list of train-step models to bench")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import (
        enable_compilation_cache,
        marginal_ms,
        train_step_ms,
    )

    enable_compilation_cache()
    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)

    rng = np.random.RandomState(0)

    if not args.skip_corr:
        print("== in-model correlation A/B (FlowNetC 448x1024 b1 bf16)",
              flush=True)
        m = get_model("c")
        p = m.init(jax.random.PRNGKey(0))
        a = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))
        row = {}
        for impl in ("mxu", "oracle", "pallas", "mxu_rerun"):
            use = impl.split("_")[0]
            with dispatch.use_implementation(use):
                ms = marginal_ms(
                    lambda p, a, b, x: m.apply(
                        p, {"input_a": a + x, "input_b": b},
                        compute_dtype=jnp.bfloat16,
                    )["flow"].mean(),
                    p, a, b, repeats=3,
                )
            row[impl] = ms
            print(f"   {impl:10s} {ms:7.3f} ms end-to-end", flush=True)
        results["correlation_in_model_flownetc"] = row

    if not args.skip_train:
        print("== deep-stack train steps (b8 @320x448, bf16)", flush=True)
        results.setdefault("train_step_deep", {})
        for model in args.models.split(","):
            for remat in (False, True):
                key = f"{model}_remat{int(remat)}"
                ms, eps = train_step_ms(
                    model, batch=8, height=320, width=448, iters=6,
                    remat=remat,
                )
                results["train_step_deep"][key] = {
                    "model": model, "batch": 8, "remat": remat,
                    "ms_per_step": ms, "examples_per_sec": eps,
                }
                print(f"   {key:14s} {ms:8.1f} ms/step "
                      f"({eps:.1f} ex/s)", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
