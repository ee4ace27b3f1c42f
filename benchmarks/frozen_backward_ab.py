"""Does freezing curriculum stages actually skip their backward pass?

The trainer freezes earlier stages by zeroing their gradients AFTER
value_and_grad (training/loop.py::step -> optim.zero_frozen_grads).
Whether that saves compute depends entirely on XLA dead-code
elimination: the zeroed leaves make the frozen stages' weight-gradient
ops dead, but XLA must prove it through the whole backward graph. This
measures the FlowNet2 fusion-stage train step (reference crop 320x448
b8 bf16) three ways:

  * frozen_zeroed   — the curriculum configuration (CSS + SD frozen,
    the model default), gradients zeroed post-hoc;
  * unfrozen        — full backward through all five nets;
  * frozen_stopgrad — frozen scopes' params wrapped in
    lax.stop_gradient INSIDE the loss (TrainConfig.stop_grad_frozen),
    so AD never builds their backward. Numerically identical to
    zeroing (frozen grads are exactly zero either way; the L2 reg
    already excludes frozen scopes).

If frozen_zeroed ~= unfrozen, DCE is NOT pruning and stop_gradient is
the fix. Appends "frozen_backward" to benchmarks/results.json.

Usage: python benchmarks/frozen_backward_ab.py [--model 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="2")
    args = parser.parse_args()

    from flownet2_tf_tpu.tools.benchlib import (
        enable_compilation_cache,
        train_step_ms,
    )

    enable_compilation_cache()
    rows = {}
    for label, frozen, stop_grad in (
        ("frozen_zeroed", None, False),
        ("unfrozen", (), False),
        ("frozen_stopgrad", None, True),
    ):
        # lr=1e-7: the unfrozen FlowNet2 config diverges to NaN from
        # random init at the usual 1e-4 within the timing scan; the
        # step cost is lr-independent
        ms, eps = train_step_ms(
            args.model, batch=8, height=320, width=448, iters=6,
            frozen=frozen, stop_grad_frozen=stop_grad, lr=1e-7,
        )
        rows[label] = {"ms_per_step": round(ms, 2),
                       "examples_per_sec": round(eps, 1)}
        print(f"  {label:16s}: {ms:7.2f} ms/step ({eps:.1f} ex/s)",
              flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["frozen_backward"] = {
        "model": args.model, "batch": 8, "height": 320, "width": 448,
        **rows,
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
