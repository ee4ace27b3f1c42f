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


def _xstat(buf, stat_names):
    """Parse one XStat: (name, value). Value field by wire format:
    2=double, 3=uint64, 4=int64, 5=str, 6=bytes, 7=ref into
    stat_metadata (a string table)."""
    import struct

    mid = None
    val = None
    for f, v, w in _fields(buf):
        if f == 1 and w == 0:
            mid = v
        elif f == 2 and w == 1:
            val = struct.unpack("<d", v)[0]
        elif f in (3, 4) and w == 0:
            val = v
        elif f in (5, 6) and w == 2:
            val = v.decode("utf-8", "replace")
        elif f == 7 and w == 0:
            val = stat_names.get(v, str(v))
    return stat_names.get(mid, str(mid)), val


def detailed_ops(xplane_path, plane_filter="TPU", line_filter="XLA Ops"):
    """Per-op records with XLA's OWN attribution stats from the xplane.

    The profiler embeds, per HLO op: ``hlo_category`` (XLA's bucket:
    "convolution fusion", "loop fusion", "data formatting", ...),
    ``source`` (repo file:line of the emitting Python), ``tf_op`` (the
    jaxpr path, e.g. ``jit(fwd)/conv_general_dilated``), ``flops`` and
    ``bytes_accessed`` — the ground truth the op ledger aggregates
    (benchmarks/op_ledger.py), replacing name-regex guessing.

    Returns {line_name: [{"name", "ms", "count", "category", "source",
    "tf_op", "flops", "bytes"} ...]} for matching planes/lines, summed
    over occurrences (ms across all trace iterations).
    """
    with open(xplane_path, "rb") as f:
        raw = f.read()
    result = {}
    for f_no, v, _ in _fields(raw):
        if f_no != 1:  # XSpace.planes
            continue
        name = None
        lines = []
        meta_raw = {}
        stat_names = {}
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
                    meta_raw[k] = meta
            elif pf == 5 and pw == 2:  # stat_metadata map entry
                k = nm = None
                for mf, mv, _w in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for sf, sv, sw in _fields(mv):
                            if sf == 2 and sw == 2:
                                nm = sv.decode("utf-8", "replace")
                if k is not None:
                    stat_names[k] = nm
        if name is None or plane_filter not in name:
            continue
        # decode event metadata now that stat names are known
        emeta = {}
        for k, meta in meta_raw.items():
            rec = {"name": None, "category": None, "source": None,
                   "tf_op": None, "flops": 0, "bytes": 0}
            for ef, ev, ew in _fields(meta):
                if ef == 2 and ew == 2:
                    rec["name"] = ev.decode("utf-8", "replace")
                elif ef == 5 and ew == 2:  # XEventMetadata.stats
                    sname, sval = _xstat(ev, stat_names)
                    if sname == "hlo_category":
                        rec["category"] = sval
                    elif sname == "source":
                        rec["source"] = sval
                    elif sname == "tf_op":
                        rec["tf_op"] = sval
                    elif sname == "flops":
                        rec["flops"] = int(sval or 0)
                    elif sname == "bytes_accessed":
                        rec["bytes"] = int(sval or 0)
            emeta[k] = rec
        plane_out = {}
        for line in lines:
            lname = "?"
            events = []
            for lf, lv, lw in _fields(line):
                if lf == 2 and lw == 2:
                    lname = lv.decode("utf-8", "replace")
                elif lf == 4 and lw == 2:
                    events.append(lv)
            if line_filter not in lname:
                continue
            per_op = {}
            for ev in events:
                mid = dur = None
                for ef, ev2, ew in _fields(ev):
                    if ef == 1 and ew == 0:
                        mid = ev2
                    elif ef == 3 and ew == 0:
                        dur = ev2
                if mid is None or not dur:
                    continue
                rec = per_op.get(mid)
                if rec is None:
                    base = emeta.get(mid) or {
                        "name": str(mid), "category": None,
                        "source": None, "tf_op": None,
                        "flops": 0, "bytes": 0,
                    }
                    rec = per_op[mid] = dict(base, ms=0.0, count=0)
                rec["ms"] += dur / 1e9  # ps -> ms
                rec["count"] += 1
            if per_op:
                plane_out[lname] = sorted(
                    per_op.values(), key=lambda r: -r["ms"]
                )
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


def trace_model_scanned(model_name="2", height=448, width=1024, batch=1,
                        iters=6, compute_dtype="bfloat16",
                        trace_dir="/tmp/flownet2_trace", warp_mode=None):
    """Like :func:`trace_model`, but traces the BENCH graph: N forwards
    chained in one jitted ``lax.scan`` (tools/bench.py methodology).

    XLA's layout solver makes materially different choices inside the
    scan body than for a standalone forward — r4 measured the
    unscanned 3-call trace overstating the serving pool/copy costs by
    ~25% relative to the marginal bench (docs/DESIGN.md
    "Profile-reading lesson #2") — so ledger rows meant to explain the
    bench number must come from THIS capture. The scan wrapper's
    `while` event covers its body and is excluded by the ledger."""
    import contextlib

    from flownet2_tf_tpu.ops import dispatch

    with contextlib.ExitStack() as stack:
        if warp_mode == "half":
            stack.enter_context(dispatch.use_half_res_warp(True))
        elif warp_mode == "full":
            stack.enter_context(dispatch.use_warp_res(1))
        return _trace_model_scanned_inner(
            model_name, height, width, batch, iters, compute_dtype,
            trace_dir,
        )


def _trace_model_scanned_inner(model_name, height, width, batch, iters,
                               compute_dtype, trace_dir):
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flownet2_tf_tpu.models.registry import get_model

    m = get_model(model_name)
    params = m.init(jax.random.PRNGKey(0))
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    if cd is not None:
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params, cd)

    @functools.partial(jax.jit, static_argnums=(0,))
    def chained(n, params, a, b):
        def body(_, x):
            preds = m.apply(params, {"input_a": a + x, "input_b": b},
                            compute_dtype=cd)
            return None, preds["flow"].mean()
        xs = jnp.arange(n, dtype=jnp.float32) * 1e-12
        _, ys = lax.scan(body, None, xs)
        return ys.sum()

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))
    float(chained(iters, params, a, b))  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        float(chained(iters, params, a, b))
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
