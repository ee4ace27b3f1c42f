"""Categorized per-op device-time ledger from an xplane trace.

r4: rebuilt on XLA's OWN per-op attribution stats — ``hlo_category``
("convolution fusion", "loop fusion", "data formatting", ...),
``source`` (repo file:line of the emitting Python), ``tf_op``, per-op
``flops`` and ``bytes_accessed`` — parsed from the xplane by
``tools/profiler.py::detailed_ops``. This replaces the r3 name-regex
bucketing and gives the itemization VERDICT r3 asked for: every op is
attributed to the repo source line that emitted it, so "the mixed
6.7 ms bucket" decomposes into gathers vs lerp vs pack vs fold vs pool
by construction.

Async ops (copy-start/done, slice-start/done) are reported separately:
they are overlap windows, not costs (docs/DESIGN.md "Profile-reading
lesson").

Usage:
    python benchmarks/op_ledger.py [--trace_dir DIR] [--iters 3]
        [--batch 1] [--top 25] [--json_out]

With --capture MODEL it first records a fresh trace (requires the TPU):
    python benchmarks/op_ledger.py --capture 2 --warp_mode half \
        --batch 8 --json_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _short_src(source):
    """Strip the benchmark-relative prefix XLA records:
    '/root/repo/benchmarks/../flownet2_tf_tpu/x.py:10' -> 'x.py:10'."""
    if not source:
        return "(xla-internal)"
    src = os.path.normpath(source.split(":", 1)[0])
    line = source.rsplit(":", 1)[-1] if ":" in source else ""
    rel = os.path.relpath(src, _REPO)
    return f"{rel}:{line}" if line else rel


def _scope_path(tf_op, depth=4):
    """Layer path from the op's jaxpr/name-stack string (r5 ledger:
    per-LAYER attribution via the models' jax.named_scope calls).

    ``tf_op`` looks like ``jit(chained)/while/body/FlowNet2‐like/
    FlowNetCSS/FlowNetCS/FlowNetC/conv3/conv_general_dilated`` — strip
    the jit/scan wrappers and the trailing primitive, keep the first
    ``depth`` scope components. Ops with no model scope (input copies,
    bench-harness arithmetic) land under '(unscoped)'."""
    if not tf_op:
        return "(unscoped)"
    parts = [p for p in tf_op.split("/")
             if p and not p.startswith(("jit(", "while", "body", "cond",
                                        "scan", "transpose(", "named("))]
    # the final component is the primitive (conv_general_dilated, ...)
    if parts:
        parts = parts[:-1]
    if not parts:
        return "(unscoped)"
    return "/".join(parts[:depth])


def ledger(xplane_path: str, iters: int, batch: int = 1):
    """Aggregate the trace's sync XLA ops. Returns a JSON-able dict:

    - ``by_category``: ms/iter per XLA hlo_category
    - ``by_file``: ms/iter per repo source file (+ (xla-internal))
    - ``by_scope``: ms/iter per model layer path (jax.named_scope)
    - ``top_sources``: largest (source_line, category) cells
    - ``top_ops``: largest individual (deduplicated) ops
    - ``conv_ms`` / ``non_conv_ms``: the headline split
    - ``flops`` / ``bytes_accessed``: XLA's analytic totals per iter
    - ``async_ms``: the overlap-window total (NOT a cost)
    """
    from flownet2_tf_tpu.tools import profiler

    detail = profiler.detailed_ops(xplane_path, line_filter="XLA Ops")
    sync_ops, async_ms = [], 0.0
    for plane, lines in detail.items():
        for lname, ops in lines.items():
            if "Async" in lname:
                async_ms += sum(o["ms"] for o in ops) / iters
            else:
                sync_ops.extend(ops)
    # control-flow wrapper events (the bench scan's `while`) COVER their
    # body ops, which are also recorded individually — counting both
    # would double the total
    sync_ops = [o for o in sync_ops
                if (o["category"] or "") not in ("while", "conditional")]
    if not sync_ops:
        raise SystemExit(f"no sync XLA ops found in {xplane_path}")

    # roofline floors per category from XLA's own analytics: flops
    # against the chip's matmul peak is a TRUE lower bound; the bytes
    # column is XLA's per-op operand+output sum, which ignores fusion
    # and therefore over-states traffic — reported as a bound estimate,
    # not a floor (bench.py roofline note)
    try:
        from flownet2_tf_tpu.tools.benchlib import device_peaks

        peak_flops, peak_bw = device_peaks()
    except Exception:
        peak_flops = peak_bw = None

    by_cat = defaultdict(float)
    by_cat_floor = defaultdict(float)
    by_cat_bytes = defaultdict(float)
    by_file = defaultdict(float)
    by_src = defaultdict(float)
    by_scope = defaultdict(float)
    by_scope_floor = defaultdict(float)
    total = flops = nbytes = 0.0
    for o in sync_ops:
        ms = o["ms"] / iters
        total += ms
        cat = o["category"] or "(uncategorized)"
        by_cat[cat] += ms
        scope = _scope_path(o.get("tf_op"))
        by_scope[scope] += ms
        if peak_flops:
            by_scope_floor[scope] += (
                o["flops"] * (o["count"] / iters) / peak_flops * 1e3
            )
        # flops/bytes stats are PER EXECUTION (static metadata, unlike
        # ms which sums occurrences): scale by how often the op ran
        execs_per_iter = o["count"] / iters
        if peak_flops:
            by_cat_floor[cat] += (
                o["flops"] * execs_per_iter / peak_flops * 1e3
            )
        if peak_bw:
            by_cat_bytes[cat] += (
                o["bytes"] * execs_per_iter / peak_bw * 1e3
            )
        src = _short_src(o["source"])
        by_file[src.split(":")[0]] += ms
        by_src[(src, cat)] += ms
        flops += o["flops"] * execs_per_iter
        nbytes += o["bytes"] * execs_per_iter

    conv_ms = sum(ms for c, ms in by_cat.items() if "convolution" in c)
    top_sources = sorted(by_src.items(), key=lambda kv: -kv[1])
    top_ops = sorted(sync_ops, key=lambda o: -o["ms"])
    return {
        "total_ms_per_iter": round(total, 3),
        "ms_per_pair": round(total / batch, 3),
        "conv_ms": round(conv_ms, 3),
        "non_conv_ms": round(total - conv_ms, 3),
        "tflops_per_iter": round(flops / 1e12, 4),
        "gbytes_accessed_per_iter": round(nbytes / 1e9, 3),
        "async_overlap_ms": round(async_ms, 3),
        "by_category": {
            c: round(ms, 3)
            for c, ms in sorted(by_cat.items(), key=lambda kv: -kv[1])
        },
        # per-category roofline columns: flops_floor_ms is a true lower
        # bound (matmul peak); bytes_est_ms uses the fusion-blind op-sum
        "by_category_flops_floor_ms": {
            c: round(by_cat_floor[c], 3)
            for c, _ in sorted(by_cat.items(), key=lambda kv: -kv[1])
        } if peak_flops else None,
        "by_category_bytes_est_ms": {
            c: round(by_cat_bytes[c], 3)
            for c, _ in sorted(by_cat.items(), key=lambda kv: -kv[1])
        } if peak_bw else None,
        "by_file": {
            f: round(ms, 3)
            for f, ms in sorted(by_file.items(), key=lambda kv: -kv[1])
        },
        # per-layer table: measured ms vs that layer's own FLOPs floor
        # — the ratio says which layers are far from roofline (the
        # serving-attack targeting data, VERDICT r4 #4)
        "by_scope": {
            s: {"ms": round(ms, 3),
                **({"flops_floor_ms": round(by_scope_floor[s], 3)}
                   if peak_flops else {})}
            for s, ms in sorted(by_scope.items(), key=lambda kv: -kv[1])
        },
        "top_sources": [
            {"source": s, "category": c, "ms": round(ms, 3)}
            for (s, c), ms in top_sources[:40]
        ],
        "top_ops": [
            {
                "ms": round(o["ms"] / iters, 3),
                "count": o["count"] // iters,
                "category": o["category"],
                "source": _short_src(o["source"]),
                "name": (o["name"] or "")[:100],
            }
            for o in top_ops[:25]
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/flownet2_trace")
    ap.add_argument("--iters", type=int, default=3,
                    help="iterations the trace recorded (x3 in profile)")
    ap.add_argument("--capture", default=None, metavar="MODEL",
                    help="record a fresh trace of MODEL first")
    ap.add_argument("--warp_mode", default="half",
                    choices=["half", "full"])
    ap.add_argument("--height", type=int, default=448)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--top", type=int, default=25,
                    help="print N largest source cells")
    ap.add_argument("--json_out", action="store_true",
                    help="merge the row into benchmarks/results.json "
                         "under op_ledger.b{batch}")
    ap.add_argument("--scan", action="store_true",
                    help="capture the SCANNED bench graph (the graph "
                         "the marginal bench times) instead of 3 "
                         "standalone forwards — required for rows "
                         "meant to explain the bench number")
    args = ap.parse_args()

    if args.capture:
        from flownet2_tf_tpu.tools import profiler
        from flownet2_tf_tpu.ops import dispatch
        import contextlib

        with contextlib.ExitStack() as st:
            if args.warp_mode == "half":
                st.enter_context(dispatch.use_half_res_warp(True))
            else:  # 'full': pin exact warps against ambient env knobs
                st.enter_context(dispatch.use_warp_res(1))
            # forward --iters: the ledger divides by it, so a trace
            # recorded with a different count would mis-scale every row
            trace_fn = (profiler.trace_model_scanned if args.scan
                        else profiler.trace_model)
            trace_fn(
                args.capture, height=args.height, width=args.width,
                batch=args.batch, iters=args.iters,
                trace_dir=args.trace_dir,
            )

    from flownet2_tf_tpu.tools.profiler import latest_xplane

    row = ledger(latest_xplane(args.trace_dir), args.iters, args.batch)
    print(f"== sync total {row['total_ms_per_iter']:.2f} ms/iter "
          f"({row['ms_per_pair']:.3f} ms/pair at b{args.batch}); "
          f"conv {row['conv_ms']:.2f} / non-conv {row['non_conv_ms']:.2f}")
    print("-- by hlo_category:")
    for c, ms in row["by_category"].items():
        print(f"   {ms:7.2f}  {c}")
    print("-- by source file:")
    for f, ms in row["by_file"].items():
        print(f"   {ms:7.2f}  {f}")
    print("-- by layer scope (ms vs own FLOPs floor):")
    for s, cell in row["by_scope"].items():
        floor = cell.get("flops_floor_ms")
        extra = f"  (floor {floor:6.2f})" if floor is not None else ""
        print(f"   {cell['ms']:7.2f}{extra}  {s}")
    print(f"-- top {args.top} source cells:")
    for cell in row["top_sources"][: args.top]:
        print(f"   {cell['ms']:7.2f}  {cell['category']:<24}"
              f" {cell['source']}")

    if args.json_out:
        row["config"] = {
            "model": args.capture or "2", "height": args.height,
            "width": args.width, "batch": args.batch,
            "warp_mode": args.warp_mode, "iters": args.iters,
            "scanned": bool(args.scan),
        }
        out_path = os.path.join(os.path.dirname(__file__), "results.json")
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            merged = {}
        merged.setdefault("op_ledger", {})[f"b{args.batch}"] = row
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=2, default=str)
        print(f"merged op_ledger.b{args.batch} into {out_path}")
    else:
        print(json.dumps({
            k: row[k] for k in
            ("total_ms_per_iter", "ms_per_pair", "conv_ms",
             "non_conv_ms", "by_category")
        }))


if __name__ == "__main__":
    main()
