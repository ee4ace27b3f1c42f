"""Shared knobs for the trained-weights A/B benchmarks.

Every stack A/B (half-res warp, warp-res k, warp-source dtype, bf16
interconv, f32 precision probe) measures its accuracy side on a held-out
synthetic eval set. The eval resolution must match the curriculum that
produced the weights: the r3 curriculum trained at 192x256, the r4
retrain (VERDICT r3 #5) at the blueprint's 320x448 crop. Rather than
hardcode either, the scripts read FLOWNET2_AB_EVAL_HW (``HxW``) and
record it in their results row next to the curriculum tag.
"""

from __future__ import annotations

import os


def eval_hw(default=(192, 256)):
    """Eval-set (height, width) from FLOWNET2_AB_EVAL_HW, or ``default``."""
    v = os.environ.get("FLOWNET2_AB_EVAL_HW")
    if not v:
        return default
    try:
        h, w = (int(x) for x in v.lower().split("x"))
    except ValueError:
        raise ValueError(
            f"FLOWNET2_AB_EVAL_HW must be HxW (e.g. 320x448), got {v!r}"
        )
    return h, w


def curriculum_name(default="r3_curriculum"):
    """Which logs/<name>/<stage> checkpoint set the A/B runs against."""
    return os.environ.get("FLOWNET2_CURRICULUM_NAME", default)
