"""Benchmark harness: frame pairs/sec/chip on the headline config.

This module IS the packaged implementation (`flownet2-tpu bench` and
`cli bench` import it from anywhere); the repo-root ``bench.py`` is the
driver's thin entry point delegating here.

Headline metric (BASELINE.json): FlowNet2 frame pairs/sec/chip at
448x1024 (Sintel padded). ``vs_baseline`` is measured against the
reference method's published runtime: FlowNet2 at ~123 ms/pair on a GTX
1080 (= 8.13 pairs/sec; the repo itself publishes no numbers —
BASELINE.md).

Methodology: N forward passes are chained inside one jitted
``lax.scan`` with an iteration-dependent input perturbation (prevents
loop-invariant hoisting) and only a scalar leaves the device. Two scan
lengths are timed and differenced, which cancels per-call dispatch/RPC
overhead — required here because the axon tunnel has ~28 ms call latency
and ``block_until_ready`` does not actually synchronize through it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 1000.0 / 123.0  # FlowNet2 paper, GTX 1080


def _timed_scan_call(fn, n):
    t0 = time.perf_counter()
    v = float(fn(n))
    t1 = time.perf_counter()
    assert np.isfinite(v), v
    return t1 - t0


def run_bench(model="2", height=448, width=1024, batch=1, iters=16,
              compute_dtype="bfloat16", repeats=2, warp_mode=None):
    import contextlib
    import os

    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    from flownet2_tf_tpu.ops import dispatch

    enable_compilation_cache()
    if warp_mode is None:
        if (os.environ.get("FLOWNET2_TPU_WARP_RES")
                or os.environ.get("FLOWNET2_TPU_HALF_RES_WARP", "0") == "1"):
            # The user set an explicit warp-res knob (`cli bench
            # --warp_res K` plumbs through these env vars): honor it
            # instead of the serving preset — the preset's thread-local
            # override would silently outrank the env and mislabel the
            # measurement.
            from flownet2_tf_tpu.ops.flow_warp import stack_warp_res

            warp_mode = f"k{stack_warp_res()}"
        else:
            # headline = the serving preset: bf16, pre-cast params,
            # HALF-RES stack warps (measured trade on trained weights:
            # +0.006 px AEE for 1.55x — docs/DESIGN.md "Half-resolution
            # stack warps"). FLOWNET2_TPU_BENCH_FULLRES=1 opts back
            # into exact warps.
            full = os.environ.get("FLOWNET2_TPU_BENCH_FULLRES", "0") == "1"
            warp_mode = ("full" if (full or compute_dtype != "bfloat16")
                         else "half")

    # `with` (not an ExitStack closed at the end): an exception
    # mid-measurement must not leak the thread-local half-res-warp
    # override into the caller's subsequent (possibly exact-warp) runs.
    with contextlib.ExitStack() as stack:
        if warp_mode == "half":
            stack.enter_context(dispatch.use_half_res_warp(True))
        elif warp_mode == "full":
            # pin exact warps even if a warp-res env var is set, so the
            # "full" label always means what it says
            stack.enter_context(dispatch.use_warp_res(1))
        return _measure(model, height, width, batch, iters, compute_dtype,
                        repeats, warp_mode)


def _measure(model, height, width, batch, iters, compute_dtype, repeats,
             warp_mode):
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from flownet2_tf_tpu.models.registry import get_model

    m = get_model(model)
    params = m.init(jax.random.PRNGKey(0))
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    if cd is not None:
        # serving-mode params: one host-side cast instead of per-call
        # weight converts; bitwise-identical bf16 forward (common.py::
        # cast_params_for_inference)
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params, cd)

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=(0,))
    def chained(n, params, a, b):
        def body(_, x):
            # iteration-dependent input: defeats loop-invariant hoisting
            preds = m.apply(
                params,
                {"input_a": a + x, "input_b": b},
                compute_dtype=cd,
            )
            return None, preds["flow"].mean()
        xs = jnp.arange(n, dtype=jnp.float32) * 1e-12
        _, ys = lax.scan(body, None, xs)
        return ys.sum()

    n_small, n_big = 2, 2 + iters
    f_small = lambda n=n_small: chained(n, params, a, b)  # noqa: E731
    f_big = lambda n=n_big: chained(n, params, a, b)  # noqa: E731

    # compile both variants
    _timed_scan_call(f_small, n_small)
    _timed_scan_call(f_big, n_big)

    best = float("inf")
    for _ in range(repeats):
        t_small = _timed_scan_call(f_small, n_small)
        t_big = _timed_scan_call(f_big, n_big)
        per_pair = (t_big - t_small) / (n_big - n_small) / batch
        best = min(best, per_pair)

    pairs_per_sec = 1.0 / best
    result = {
        "metric": f"flownet{model}_pairs_per_sec_{height}x{width}_b{batch}"
                  f"_{compute_dtype}",
        "value": round(pairs_per_sec, 3),
        "unit": "frame_pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
        "ms_per_pair": round(1000.0 * best, 3),
        "backend": jax.default_backend(),
        # serving preset vs exact warps; the measured accuracy cost of
        # "half" on trained weights is +0.006 px AEE (docs/DESIGN.md)
        "warp_mode": warp_mode,
    }

    # Roofline accounting (VERDICT r1 #4): XLA's analytic FLOP count and
    # HBM-byte estimate for ONE forward pair, against the chip's peaks.
    # mfu = achieved FLOP rate / peak; hbm_util = estimated HBM traffic
    # rate / peak bandwidth. Together they say which wall the model sits
    # against (FlowNet2 at b1 is bandwidth/gather-bound, not FLOP-bound).
    from flownet2_tf_tpu.tools import benchlib

    def one_pair(params, a, b):
        return m.apply(
            params, {"input_a": a, "input_b": b}, compute_dtype=cd
        )["flow"].mean()

    flops, hbm_bytes = benchlib.cost_analysis(one_pair, params, a, b)
    peak_flops, peak_bw = benchlib.device_peaks()
    if flops:
        result["model_tflops_per_pair"] = round(flops / batch / 1e12, 4)
        if peak_flops:
            result["mfu"] = round(flops / batch / best / peak_flops, 4)
    if hbm_bytes:
        # XLA sums operand+output bytes per HLO op ignoring fusion, so
        # this is an UPPER BOUND on traffic, not a measurement (for
        # FlowNet2 it exceeds time x peak-BW several-fold). The physical
        # ceiling on what actually moved is time x peak bandwidth.
        result["hbm_gb_xla_opsum_bound"] = round(hbm_bytes / batch / 1e9, 3)
        if peak_bw:
            result["hbm_gb_physical_ceiling"] = round(
                best * peak_bw / 1e9, 3
            )
    return result


def main():
    result = run_bench()
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    for k in ("mfu", "ms_per_pair"):
        if k in result:
            line[k] = result[k]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
