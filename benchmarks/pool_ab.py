"""A/B the four _pool2 lowerings IN-MODEL (FlowNet2 serving preset).

The 2x2 pool runs on every half-res stack warp input; its reshape-mean
lowering showed up as ~1.0 ms/pair of f32 reshape+reduce in the r3
serving-preset op ledger. Isolated microbenches mislead on this chip
(docs/DESIGN.md, twice over), so the deciding measurement is the
end-to-end serving forward with each lowering forced via
FLOWNET2_TPU_POOL2. Each impl runs in its own SUBPROCESS — _POOL2_IMPL
is read at import and the module-level jit caches would otherwise pin
the first lowering. Appends a "pool2_ab" row to results.json.

Usage: python benchmarks/pool_ab.py [--impls window,slices,conv,reshape]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _measure_in_process():
    """Child mode: measure the impl already pinned in the environment."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.common import cast_params_for_inference
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.ops.flow_warp import _POOL2_IMPL
    from flownet2_tf_tpu.tools.benchlib import (
        enable_compilation_cache, marginal_ms)

    assert _POOL2_IMPL == os.environ["FLOWNET2_TPU_POOL2"]
    enable_compilation_cache()

    m = get_model("2")
    params = cast_params_for_inference(
        m.init(jax.random.PRNGKey(0)), jnp.bfloat16
    )
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 448, 1024, 3).astype(np.float32))

    with dispatch.use_half_res_warp(True):
        def fwd(params, a, b, x):
            return m.apply(
                params, {"input_a": a + x, "input_b": b},
                compute_dtype=jnp.bfloat16,
            )["flow"].mean()

        ms = marginal_ms(fwd, params, a, b)
    print(json.dumps({"ms_per_pair": round(ms, 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="window,slices,conv,reshape")
    ap.add_argument("--_child", action="store_true")
    args = ap.parse_args()

    if args._child:
        _measure_in_process()
        return

    row = {}
    for impl in args.impls.split(","):
        env = dict(os.environ, FLOWNET2_TPU_POOL2=impl)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_child"],
            env=env, capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if out.returncode != 0:
            print(out.stdout)
            print(out.stderr[-2000:])
            raise SystemExit(f"child failed for impl={impl}")
        ms = json.loads(out.stdout.strip().splitlines()[-1])["ms_per_pair"]
        row[impl] = {"ms_per_pair": ms}
        print(f"pool2={impl}: {ms} ms/pair", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["pool2_ab"] = dict(
        row, note="FlowNet2 448x1024 b1 bf16 serving preset (half-res "
                  "warps, pre-cast params); _pool2 lowering forced via "
                  "FLOWNET2_TPU_POOL2, one subprocess per impl")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["pool2_ab"]))


if __name__ == "__main__":
    main()
