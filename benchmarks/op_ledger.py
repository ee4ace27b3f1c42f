"""Categorized per-op device-time ledger from an xplane trace.

Groups EVERY sync XLA op in the trace into buckets (convolution
fusions, warp gathers, layout copies, reduces/pools, elementwise glue,
...) and prints per-iteration totals — the accounting DESIGN.md's
"remaining profile" paragraphs cite. Async ops (copy-start/done,
slice-start/done) are reported separately: they are overlap windows,
not costs (docs/DESIGN.md "Profile-reading lesson").

Usage:
    python benchmarks/op_ledger.py [--trace_dir /tmp/flownet2_trace]
        [--iters 3]

With --capture MODEL it first records a fresh trace (requires the TPU):
    python benchmarks/op_ledger.py --capture 2 --warp_mode half
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def categorize(name: str) -> str:
    """Bucket an HLO op by its name + operand text."""
    head = name.split(" = ", 1)[0].lstrip("%")
    body = name.split(" = ", 1)[1] if " = " in name else ""
    base = re.sub(r"\.\d+$", "", head)
    if base.endswith(("copy", "copy-done", "transpose")):
        return "layout copy / transpose"
    if base in ("pad", "slice", "concatenate", "reshape", "bitcast",
                "reverse", "dynamic-slice", "dynamic-update-slice"):
        return "reshape / slice / concat"
    if base == "reduce":
        return "reduce / pool"
    if "convolution" in body or "conv" in base:
        return "convolution"
    if "gather" in body or "gather" in base:
        return "warp gather"
    if "fusion" in base:
        # Fusions carry their root op in the operand text when the
        # profiler kept it; classify by strongest signal present.
        if "convolution(" in body:
            return "convolution"
        if "gather(" in body:
            return "warp gather"
        if "dot(" in body:
            return "matmul / dot"
        if "reduce(" in body:
            return "reduce / pool"
        # Heuristics by operand shapes: a fusion consuming a small
        # HWIO-looking weight alongside a big activation is a conv
        # fusion XLA renamed (select/compare fusions around convs).
        if re.search(r"\[\d,\d,\d+,\d+\]", body) and (
            "compare_select" in head or "select_bitcast" in head
            or "broadcast_select" in head
        ):
            return "convolution (select-fused)"
        return "fusion (other)"
    if base in ("dot",):
        return "matmul / dot"
    if base.startswith(("all-reduce", "all-gather", "collective")):
        return "collective"
    return "other"


def ledger(xplane_path: str, iters: int, top_names: int = 8):
    from flownet2_tf_tpu.tools import profiler

    summ = profiler.summarize_xplane(xplane_path, top=100000)
    out = {}
    for plane, lines in summ.items():
        for line, ops in lines.items():
            if "XLA Ops" not in line or "Async" in line:
                continue
            cats = defaultdict(float)
            examples = defaultdict(list)
            total = 0.0
            for ms, cnt, name in ops:
                cat = categorize(name)
                cats[cat] += ms / iters
                total += ms / iters
                examples[cat].append((ms / iters, name[:110]))
            out[f"{plane} / {line}"] = (total, cats, examples)
    return out


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
    ap.add_argument("--examples", type=int, default=0,
                    help="print N largest ops per category")
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
            profiler.trace_model(
                args.capture, height=args.height, width=args.width,
                iters=args.iters, trace_dir=args.trace_dir,
            )

    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")
    res = ledger(paths[-1], args.iters)
    for key, (total, cats, examples) in res.items():
        print(f"== {key}: {total:.2f} ms/iter sync total")
        for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {ms:7.2f} ms  {cat}")
            if args.examples:
                for ems, name in sorted(examples[cat], reverse=True)[
                    : args.examples
                ]:
                    print(f"            {ems:6.2f}  {name}")
        print(json.dumps(
            {"total_ms_per_iter": round(total, 3),
             "by_category": {k: round(v, 3) for k, v in cats.items()}}
        ))


if __name__ == "__main__":
    main()
