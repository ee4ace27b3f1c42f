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

Self-validation (VERDICT r4 #1 — round 4 published a 4.6x-wrong
headline measured while a detached chain held the chip):
  * the whole measurement runs under the exclusive TPU arbiter
    (``tools/arbiter.tpu_lock``), so no sibling process can interleave
    device work with the timing scans;
  * the published value is the MEDIAN of >=5 repeats, with the
    spread ((max-min)/median) disclosed in the artifact;
  * a sanity gate refuses to publish a per-pair time below 1.5x the
    model's analytic FLOPs floor (XLA cost analysis / chip peak — the
    op ledger's committed b1 floor is 2.84-2.92 ms) or with spread
    >15%: such a sample is re-measured, and if it never passes the
    floor gate the bench RAISES instead of printing a false number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"ms_per_pair", "warp_mode", "spread_pct", ...} plus a full-res (exact
warps) companion time so the artifact discloses that the headline uses
the approximate serving preset.
"""

from __future__ import annotations

import json
import statistics
import time

import numpy as np

REFERENCE_PAIRS_PER_SEC = 1000.0 / 123.0  # FlowNet2 paper, GTX 1080

# Publish gates (VERDICT r4 #1c). FLOOR_SAFETY x analytic-FLOPs floor is
# the lowest credible per-pair time: the op ledger measured 7+ ms of
# non-conv work still in the graph, so anything under ~1.5x the conv
# floor is a contention/measurement artifact, not a result.
FLOOR_SAFETY = 1.5
MAX_SPREAD = 0.15
MEASURE_ATTEMPTS = 3


def check_samples(samples, floor_ms=None):
    """Gate a sorted list of per-pair seconds: returns (median_s,
    spread_frac, reject_reason_or_None).

    Rejections (VERDICT r4 #1c): median below FLOOR_SAFETY x the
    analytic FLOPs floor (physically implausible — the r4 contention
    artifact), or inter-repeat spread above MAX_SPREAD (unstable —
    another process is probably touching the device). Pure function so
    the gates are unit-testable without hardware."""
    samples = sorted(samples)
    median = statistics.median(samples)
    spread = ((samples[-1] - samples[0]) / median
              if len(samples) > 1 and median > 0 else 0.0)
    reason = None
    if floor_ms is not None and median * 1000.0 < FLOOR_SAFETY * floor_ms:
        reason = (f"median {median * 1000.0:.3f} ms/pair below "
                  f"{FLOOR_SAFETY}x analytic FLOPs floor "
                  f"({floor_ms:.3f} ms) — physically implausible")
    elif len(samples) >= 3 and spread > MAX_SPREAD:
        reason = (f"spread {spread * 100.0:.1f}% over {len(samples)} "
                  f"repeats exceeds {MAX_SPREAD * 100.0:.0f}%")
    return median, spread, reason


def _timed_scan_call(fn, n):
    t0 = time.perf_counter()
    v = float(fn(n))
    t1 = time.perf_counter()
    assert np.isfinite(v), v
    return t1 - t0


def run_bench(model="2", height=448, width=1024, batch=1, iters=16,
              compute_dtype="bfloat16", repeats=5, warp_mode=None,
              validate=True, lock_timeout=3600.0):
    import contextlib
    import os

    from flownet2_tf_tpu.tools.arbiter import tpu_lock
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
            # HALF-RES stack warps. Measured accuracy cost on trained
            # weights: within +-0.011 px AEE (r3 192x256 weights:
            # +0.006 to +0.011; r4 320x448 weights: -0.010, half-res
            # slightly BETTER — docs/DESIGN.md "Half-resolution stack
            # warps"). FLOWNET2_TPU_BENCH_FULLRES=1 opts back into
            # exact warps.
            full = os.environ.get("FLOWNET2_TPU_BENCH_FULLRES", "0") == "1"
            warp_mode = ("full" if (full or compute_dtype != "bfloat16")
                         else "half")

    # `with` (not an ExitStack closed at the end): an exception
    # mid-measurement must not leak the thread-local half-res-warp
    # override into the caller's subsequent (possibly exact-warp) runs.
    with contextlib.ExitStack() as stack:
        # exclusive device use for the WHOLE measurement, including the
        # cost-analysis compile (VERDICT r4 #1a)
        stack.enter_context(tpu_lock(label="bench", timeout=lock_timeout))
        if warp_mode == "half":
            stack.enter_context(dispatch.use_half_res_warp(True))
        elif warp_mode == "full":
            # pin exact warps even if a warp-res env var is set, so the
            # "full" label always means what it says
            stack.enter_context(dispatch.use_warp_res(1))
        return _measure(model, height, width, batch, iters, compute_dtype,
                        repeats, warp_mode, validate)


def _measure(model, height, width, batch, iters, compute_dtype, repeats,
             warp_mode, validate):
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.tools import benchlib

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

    # --- analytic floor FIRST (cheap: one-pair compile, cached), so the
    # timing loop can gate its own output against it
    def one_pair(params, a, b):
        return m.apply(
            params, {"input_a": a, "input_b": b}, compute_dtype=cd
        )["flow"].mean()

    flops, hbm_bytes = benchlib.cost_analysis(one_pair, params, a, b)
    peak_flops, peak_bw = benchlib.device_peaks()
    floor_ms = None
    if flops and peak_flops:
        floor_ms = flops / batch / peak_flops * 1000.0

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

    def sample_once():
        t_small = _timed_scan_call(f_small, n_small)
        t_big = _timed_scan_call(f_big, n_big)
        return (t_big - t_small) / (n_big - n_small) / batch

    reject_reasons = []
    for attempt in range(MEASURE_ATTEMPTS):
        samples = sorted(sample_once() for _ in range(max(repeats, 1)))
        per_pair, spread, reason = check_samples(samples, floor_ms)
        if not validate or reason is None:
            break
        reject_reasons.append(f"attempt {attempt + 1}: {reason}")
        print(json.dumps({"bench_retry": reject_reasons[-1]}), flush=True)
    else:
        # every attempt failed a gate
        below_floor = any("floor" in r for r in reject_reasons)
        if below_floor:
            raise RuntimeError(
                "bench refused to publish: " + "; ".join(reject_reasons)
            )
        # spread never settled: publish the median but DISCLOSE it —
        # a labeled noisy number beats no artifact, a silent one does not

    pairs_per_sec = 1.0 / per_pair
    result = {
        "metric": f"flownet{model}_pairs_per_sec_{height}x{width}_b{batch}"
                  f"_{compute_dtype}",
        "value": round(pairs_per_sec, 3),
        "unit": "frame_pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
        "ms_per_pair": round(1000.0 * per_pair, 3),
        "backend": jax.default_backend(),
        # serving preset vs exact warps; measured accuracy delta of
        # "half" on trained weights is within +-0.011 px AEE across the
        # r3/r4 curricula (docs/DESIGN.md)
        "warp_mode": warp_mode,
        "repeats": len(samples),
        "spread_pct": round(spread * 100.0, 1),
    }
    from flownet2_tf_tpu.ops import dispatch as _dispatch

    fusion_k = _dispatch.get_fusion_res()
    if fusion_k != 1:
        # approximation knobs must be visible in the artifact
        # (VERDICT r4 weak #5): FLOWNET2_TPU_FUSION_RES=2 runs the
        # fusion net at half resolution (benchmarks/fusion_res_ab.py)
        result["fusion_res"] = fusion_k
    if reject_reasons:
        result["suspect"] = "; ".join(reject_reasons)
    if floor_ms is not None:
        result["floor_ms_analytic"] = round(floor_ms, 3)

    # Roofline accounting (VERDICT r1 #4): XLA's analytic FLOP count and
    # HBM-byte estimate for ONE forward pair, against the chip's peaks.
    # mfu = achieved FLOP rate / peak; hbm_util = estimated HBM traffic
    # rate / peak bandwidth. Together they say which wall the model sits
    # against (FlowNet2 at b1 is bandwidth/gather-bound, not FLOP-bound).
    if flops:
        result["model_tflops_per_pair"] = round(flops / batch / 1e12, 4)
        if peak_flops:
            result["mfu"] = round(flops / batch / per_pair / peak_flops, 4)
    if hbm_bytes:
        # XLA sums operand+output bytes per HLO op ignoring fusion, so
        # this is an UPPER BOUND on traffic, not a measurement (for
        # FlowNet2 it exceeds time x peak-BW several-fold). The physical
        # ceiling on what actually moved is time x peak bandwidth.
        result["hbm_gb_xla_opsum_bound"] = round(hbm_bytes / batch / 1e9, 3)
        if peak_bw:
            result["hbm_gb_physical_ceiling"] = round(
                per_pair * peak_bw / 1e9, 3
            )
    return result


def main():
    import os

    result = run_bench()
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    for k in ("mfu", "ms_per_pair", "warp_mode", "fusion_res",
              "spread_pct", "suspect"):
        if k in result:
            line[k] = result[k]
    # Full-res (exact-warp) companion (VERDICT r4 weak #5): the headline
    # uses the serving preset; the artifact must also carry the exact
    # number so the preset's speedup is disclosed, not hidden. Skippable
    # (FLOWNET2_TPU_BENCH_COMPANION=0) and non-fatal: a missing
    # companion must not cost the headline artifact.
    if (result.get("warp_mode") != "full"
            and os.environ.get("FLOWNET2_TPU_BENCH_COMPANION", "1") == "1"):
        try:
            full = run_bench(warp_mode="full", iters=8, repeats=3)
            line["fullres_ms_per_pair"] = full["ms_per_pair"]
        except Exception as e:  # noqa: BLE001
            line["fullres_ms_per_pair"] = f"unavailable: {e}"
    print(json.dumps(line))


if __name__ == "__main__":
    main()
