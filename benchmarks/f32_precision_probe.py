"""f32 parity-path cost probe (VERDICT r2 #9).

The parity path (compute_dtype=float32) forces HIGHEST matmul precision
on EVERY conv, costing 64 ms/pair vs 23 bf16. This measures the variant
where only the flow heads/upsamplers keep HIGHEST and feature convs use
DEFAULT precision (dispatch.use_f32_features_precision('default')):

  (a) FlowNet2 448x1024 b1 forward ms, HIGHEST vs DEFAULT-features;
  (b) flow delta + AEE delta on the trained curriculum FlowNet2
      (logs/r3_curriculum/2) between the two — the parity budget is
      <=1e-2 EPE, so the fast variant is only labelable "parity" if its
      delta vs the HIGHEST anchor is well inside that.

Usage: python benchmarks/f32_precision_probe.py
Appends "f32_precision" to benchmarks/results.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache, \
        marginal_ms
    from benchmarks.halfres_warp_ab import load_trained_params

    enable_compilation_cache()
    model = get_model("2")
    params = load_trained_params()
    trained = params is not None
    if not trained:
        print("no trained ckpt — random init", flush=True)
        params = model.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))

    row = {"trained_weights": trained}
    print("== speed (448x1024 b1 f32)", flush=True)
    for mode in ("highest", "default"):
        with dispatch.use_f32_features_precision(mode):
            ms = marginal_ms(
                lambda p, x, y, t: model.apply(
                    p, {"input_a": x + t, "input_b": y},
                    compute_dtype=None,
                )["flow"].mean(),
                params, a, b, repeats=3,
            )
        row[f"forward_ms_{mode}"] = ms
        print(f"  {mode:8s}: {ms:7.2f} ms/pair", flush=True)

    print("== accuracy vs the HIGHEST anchor (held-out synthetic)",
          flush=True)
    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset

    from ab_common import eval_hw
    eh, ew = eval_hw()
    ds = SyntheticFlowDataset(size=12, height=eh, width=ew, seed=1234)

    # one jitted closure per mode: the precision override is a
    # thread-local read at TRACE time, so a single cached jit would
    # silently serve both modes
    def make_fwd(mode):
        @jax.jit
        def fwd(p, x, y):
            with dispatch.use_f32_features_precision(mode):
                return model.apply(
                    p, {"input_a": x, "input_b": y}, compute_dtype=None
                )["flow"]
        return fwd

    fwd_h = make_fwd("highest")
    fwd_d = make_fwd("default")

    flow_delta, aee_h, aee_d = [], [], []
    for i in range(len(ds)):
        it = ds[i]
        xa = jnp.asarray(it["image_a"])[None]
        xb = jnp.asarray(it["image_b"])[None]
        fh = np.asarray(fwd_h(params, xa, xb))
        fd = np.asarray(fwd_d(params, xa, xb))
        flow_delta.append(np.abs(fh - fd).mean())
        gt = it["flow"]
        aee_h.append(np.sqrt(((fh[0] - gt) ** 2).sum(-1)).mean())
        aee_d.append(np.sqrt(((fd[0] - gt) ** 2).sum(-1)).mean())
    row["flow_delta_px_mean"] = float(np.mean(flow_delta))
    row["aee_highest"] = float(np.mean(aee_h))
    row["aee_default_features"] = float(np.mean(aee_d))
    row["aee_delta"] = row["aee_default_features"] - row["aee_highest"]
    print(f"  flow delta {row['flow_delta_px_mean']:.6f} px; AEE "
          f"{row['aee_highest']:.5f} -> {row['aee_default_features']:.5f} "
          f"(delta {row['aee_delta']:+.6f})", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["f32_precision"] = row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
