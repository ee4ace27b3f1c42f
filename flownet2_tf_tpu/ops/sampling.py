"""Bilinear gather, TPU-shaped: the neighbor-packed flat-gather formulation.

TPU XLA lowers per-pixel gathers of tiny (C=2..3 element) slices at
~1/100 of HBM bandwidth — each gathered row pads to a 128-lane vector.
Measured on v5e at 448x1024x3 (benchmarks/warp_experiments.py):

* four 3-element gathers ("naive4"):             10.2 ms f32 / 2.7 bf16
* ONE gather of a 4-neighbor-packed 12-element
  record, 3-D operand (N, H*W, 12) via
  ``take_along_axis`` ("packed", round-1 path):   2.2 ms f32 / 1.4 bf16
* the same record but a 2-D operand (N*H*W, 12)
  via ``jnp.take`` ("packed_flat", this file):    2.1 ms f32 (at N=1)

So: pre-pack ``Z[y, x] = [img[y,x], img[y,x+1], img[y+1,x],
img[y+1,x+1]]`` with three vectorized shifts (cheap, fused), gather Z
once at the floor coordinate, and lerp the four packed taps.

Batch scaling: XLA's TPU gather emitter degrades superlinearly with the
OPERAND row count — measured ~4.8 ns/record on a 459K-row operand but
~23 ns/record on a 1.8M-row operand (in-model, b4), which made batched
inference anti-scale (VERDICT r1 #6). The batch loop below therefore
splits the gather per sample: N gathers each over one sample's table,
every one in the fast regime. Measured FlowNet2 b4: 47.0 -> 29.4
ms/pair end-to-end. Within one sample the record rate is flat across
record widths 12..64 B (cost is per-record issue rate, not bandwidth),
so further packing does not help; ~2 ms per full-res (459K-record)
gather is the emitter's floor on v5e.

Border semantics: sample coordinates are clamped to [0, size-1] BEFORE
the floor split ("clamp-first"), which is algebraically identical to
the reference CUDA kernel's per-tap index clamp for border-replicate
sampling (reference src/ops/flow_warp/flow_warp.cu.cc) because a
clamped coordinate yields wx/wy in {0, 1} at the borders.
"""

from __future__ import annotations

import os as _os

import jax.numpy as jnp
from jax import lax

# Above this many samples the per-sample split rolls into one
# ``lax.map`` body instead of a Python unroll: augmentation-path batch
# sizes (B=64) would otherwise inherit N unrolled gather subgraphs and
# linearly growing trace/compile time (ADVICE r2). Each mapped gather
# still sees a single-sample operand, so the emitter stays in its fast
# regime; the in-model warp batches (n<=4, where the unroll was
# measured) are unaffected. Runtime A/B at serving batches:
# benchmarks/unroll_ab.py -> results.json::unroll_ab. Override with
# FLOWNET2_TPU_UNROLL_MAX (read at import; it cannot join
# dispatch.trace_signature() because the jitted warp bodies close over
# it at trace time — A/Bs must use a fresh process per value).
_UNROLL_MAX_SAMPLES = int(_os.environ.get("FLOWNET2_TPU_UNROLL_MAX", "8"))


def _pack_table(image, gather_dtype=None):
    """(1, h, w, c) -> flat (h*w, 4c) 4-neighbor record table."""
    n, h, w, c = image.shape
    ip = jnp.pad(image, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    z = jnp.concatenate(
        [
            ip[:, :h, :w],
            ip[:, :h, 1 : w + 1],
            ip[:, 1 : h + 1, :w],
            ip[:, 1 : h + 1, 1 : w + 1],
        ],
        axis=-1,
    )  # (n, h, w, 4C)
    if gather_dtype is not None:
        z = z.astype(gather_dtype)
    return z.reshape(n * h * w, 4 * c)


def _gather_lerp(flat, x2, y2, w, c):
    """Gather packed records from ``flat`` ((h*w, 4c)) and lerp.

    ``x2``/``y2``: (1, h', w') pre-clipped float coords into the table's
    source grid.
    """
    out_shape = x2.shape
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)).reshape(-1)
    g = jnp.take(flat, idx, axis=0)
    g = g.reshape(out_shape + (4, c))
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    wts = jnp.stack([w00, w01, w10, w11], axis=-2)  # (..., 4, 1)
    return jnp.sum(g * wts.astype(g.dtype), axis=-2)


def bilinear_gather(image, x2, y2, gather_dtype=None):
    """Sample NHWC ``image`` at float coords (B, h, w), border-replicate.

    Returns (B, h, w, C). Differentiable in image and coords. Batched
    inputs gather per-sample (see module docstring: the gather emitter's
    record rate collapses on large operands, so N small gathers beat one
    big one).

    ``gather_dtype``: optional storage dtype for the packed 4-tap table
    (the gather operand ONLY — coordinates and lerp weights stay f32).
    bf16 gathers ~1.5x faster ISOLATED but measured r2 it LOSES in-model
    (FlowNet2 29.4 vs 24.7 ms): the f32->bf16 relayout XLA inserts
    around the table build outweighs the halved gather traffic. The
    models therefore leave it None; the knob stays for shapes/backends
    where the isolated win transfers. Output dtype follows gather_dtype
    when set.
    """
    n, h, w, c = image.shape
    x2 = jnp.clip(x2, 0.0, w - 1)
    y2 = jnp.clip(y2, 0.0, h - 1)
    if n > _UNROLL_MAX_SAMPLES:
        def one(args):
            img_i, x_i, y_i = args
            flat = _pack_table(img_i[None], gather_dtype)
            return _gather_lerp(flat, x_i[None], y_i[None], w, c)[0]

        return lax.map(one, (image, x2, y2))
    outs = []
    for i in range(n):
        flat = _pack_table(image[i : i + 1], gather_dtype)
        outs.append(
            _gather_lerp(flat, x2[i : i + 1], y2[i : i + 1], w, c)
        )
    return outs[0] if n == 1 else jnp.concatenate(outs, axis=0)


def bilinear_gather_multi(image, x2, y2, gather_dtype=None):
    """Sample ONE image ((1, h, w, c)) at M coordinate sets.

    ``x2``/``y2``: (M, h', w'). Builds the packed table ONCE and gathers
    M times from it — the fusion-stage double warp (same image, two
    flows) uses this instead of duplicating the image into a batch.
    Returns (M, h', w', C).
    """
    n, h, w, c = image.shape
    assert n == 1, "bilinear_gather_multi expects a single image"
    x2 = jnp.clip(x2, 0.0, w - 1)
    y2 = jnp.clip(y2, 0.0, h - 1)
    flat = _pack_table(image, gather_dtype)
    m = x2.shape[0]
    outs = [
        _gather_lerp(flat, x2[j : j + 1], y2[j : j + 1], w, c)
        for j in range(m)
    ]
    return outs[0] if m == 1 else jnp.concatenate(outs, axis=0)
