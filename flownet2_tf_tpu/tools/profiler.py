"""Profiling harness + xplane trace summarizer.

The reference had NO profiler integration (SURVEY.md §5 tracing row).
This module provides the TPU-native story:

* :func:`trace_model` — capture a ``jax.profiler`` trace of N forward
  passes of any registered model.
* :func:`summarize_xplane` — parse the resulting ``*.xplane.pb`` with
  the framework's own protobuf wire-format reader (no
  tensorboard_plugin_profile dependency — its converter is incompatible
  with the installed TF) and report per-op device time.

CLI: ``python -m flownet2_tf_tpu.cli profile --model 2``.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict

from flownet2_tf_tpu.data.tfrecord import _iter_fields


def _fields(buf):
    return list(_iter_fields(buf))


def summarize_xplane(xplane_path, plane_filter="TPU", top=25):
    """Parse an .xplane.pb -> [(total_ms, count, op_name)] per plane line.

    Returns {plane_name: {line_name: [(ms, count, name), ...]}} sorted by
    total time descending.
    """
    with open(xplane_path, "rb") as f:
        raw = f.read()
    result = {}
    for f_no, v, _ in _fields(raw):
        if f_no != 1:  # XSpace.planes
            continue
        name = None
        lines = []
        emeta = {}
        for pf, pv, pw in _fields(v):
            if pf == 2 and pw == 2:
                name = pv.decode("utf-8", "replace")
            elif pf == 3 and pw == 2:
                lines.append(pv)
            elif pf == 4 and pw == 2:  # event_metadata map entry
                k = meta = None
                for mf, mv, _w in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        meta = mv
                if meta is not None:
                    mname = None
                    for ef, ev, ew in _fields(meta):
                        if ef == 2 and ew == 2:
                            mname = ev.decode("utf-8", "replace")
                    emeta[k] = mname
        if name is None or plane_filter not in name:
            continue
        plane_out = {}
        for line in lines:
            lname = "?"
            events = []
            for lf, lv, lw in _fields(line):
                if lf == 2 and lw == 2:
                    lname = lv.decode("utf-8", "replace")
                elif lf == 4 and lw == 2:  # XLine.events
                    events.append(lv)
            durs = defaultdict(float)
            counts = defaultdict(int)
            for ev in events:
                mid = dur = None
                for ef, ev2, ew in _fields(ev):
                    if ef == 1 and ew == 0:
                        mid = ev2
                    elif ef == 3 and ew == 0:
                        dur = ev2
                if mid is not None and dur:
                    key = emeta.get(mid, str(mid))
                    durs[key] += dur / 1e9  # ps -> ms
                    counts[key] += 1
            rows = sorted(
                ((t, counts[n2], n2) for n2, t in durs.items()),
                reverse=True,
            )[:top]
            if rows:
                plane_out[lname] = rows
        result[name] = plane_out
    return result


def latest_xplane(trace_dir):
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        )
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return paths[-1]


def trace_model(model_name="2", height=448, width=1024, batch=1, iters=3,
                compute_dtype="bfloat16", trace_dir="/tmp/flownet2_trace",
                warp_mode=None):
    """Run + trace N forwards; returns the trace directory.

    ``warp_mode="half"`` profiles the serving preset (half-res stack
    warps, docs/DESIGN.md); ``"full"`` pins exact warps; ``None``
    (default) follows the ``FLOWNET2_TPU_WARP_RES`` /
    ``FLOWNET2_TPU_HALF_RES_WARP`` env knobs (so ``cli profile
    --warp_res K`` is not silently outranked)."""
    import contextlib

    from flownet2_tf_tpu.ops import dispatch

    # `with` so an exception mid-trace can't leak the thread-local
    # half-res-warp override into the caller's later exact-warp runs
    with contextlib.ExitStack() as stack:
        if warp_mode == "half":
            stack.enter_context(dispatch.use_half_res_warp(True))
        elif warp_mode == "full":
            stack.enter_context(dispatch.use_warp_res(1))
        return _trace_model_inner(
            model_name, height, width, batch, iters, compute_dtype,
            trace_dir,
        )


def _trace_model_inner(model_name, height, width, batch, iters,
                       compute_dtype, trace_dir):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model

    m = get_model(model_name)
    params = m.init(jax.random.PRNGKey(0))
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    if cd is not None:
        # match the serving/bench configuration (pre-cast params)
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params, cd)

    @jax.jit
    def fwd(params, a, b):
        return m.apply(params, {"input_a": a, "input_b": b},
                       compute_dtype=cd)["flow"].mean()

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))
    float(fwd(params, a, b))  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            float(fwd(params, a, b))
    return trace_dir


def print_summary(trace_dir, top=20):
    xp = latest_xplane(trace_dir)
    summary = summarize_xplane(xp, top=top)
    for plane, lines in summary.items():
        print(f"== plane {plane}")
        for lname, rows in lines.items():
            total = sum(t for t, _, _ in rows)
            print(f"-- line {lname} (top-{len(rows)} total {total:.1f} ms)")
            for t, c, n in rows:
                print(f"   {t:9.2f} ms x{c:<5d} {n[:90]}")
    return summary
