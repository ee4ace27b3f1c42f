"""Bilinear gather, TPU-shaped: the neighbor-packed flat-gather formulation.

TPU XLA lowers per-pixel gathers of tiny (C=2..3 element) slices at
~1/100 of HBM bandwidth — each gathered row pads to a 128-lane vector.
Measured on v5e at 448x1024x3 (benchmarks/warp_experiments.py):

* four 3-element gathers ("naive4"):             10.2 ms f32 / 2.7 bf16
* ONE gather of a 4-neighbor-packed 12-element
  record, 3-D operand (N, H*W, 12) via
  ``take_along_axis`` ("packed", round-1 path):   2.2 ms f32 / 1.4 bf16
* the same record but a 2-D operand (N*H*W, 12)
  via ``jnp.take`` ("packed_flat", this file):    2.1 ms f32 / 0.17 bf16

The batch-folded 2-D operand is the load-bearing trick: XLA's TPU
gather emitter handles a rank-2 operand with a small minor dim
dramatically better than the equivalent rank-3 batched gather (8x at
bf16 — the bf16 record is 24 bytes, within one 32-byte sublane word).

So: pre-pack ``Z[y, x] = [img[y,x], img[y,x+1], img[y+1,x],
img[y+1,x+1]]`` with three vectorized shifts (cheap, fused), flatten
batch into the gather axis, gather Z once at the floor coordinate, and
lerp the four packed taps.

Border semantics: sample coordinates are clamped to [0, size-1] BEFORE
the floor split ("clamp-first"), which is algebraically identical to
clamping the four neighbor indices separately (border replicate, the
reference CUDA FlowWarp behavior) but keeps the packed gather exact at
the edges.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_gather(image, x2, y2, gather_dtype=None):
    """Sample NHWC ``image`` at float coords (B, h, w), border-replicate.

    Returns (B, h, w, C). Differentiable in image and coords.

    ``gather_dtype``: optional storage dtype for the packed 4-tap table
    (the gather operand ONLY — coordinates and lerp weights stay f32).
    bf16 packs the record into 24 bytes, one sublane word, and gathers
    ~3.4x faster than f32 at 448x1024 ISOLATED (0.62 vs 2.09 ms) —
    but measured r2 it LOSES in-model (FlowNet2 29.4 vs 24.7 ms): the
    f32->bf16 relayout XLA inserts around the table build outweighs the
    halved gather traffic. The models therefore leave it None; the knob
    stays for shapes/backends where the isolated win transfers. Output
    dtype follows gather_dtype when set.
    """
    n, h, w, c = image.shape
    out_shape = x2.shape

    x2 = jnp.clip(x2, 0.0, w - 1)
    y2 = jnp.clip(y2, 0.0, h - 1)
    x0 = jnp.floor(x2)
    y0 = jnp.floor(y2)
    wx = (x2 - x0)[..., None]
    wy = (y2 - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # neighbor-packed copy: edge-pad right/bottom then 4 shifted views
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

    # fold batch into the gather axis: rank-2 operand, flat indices
    flat = z.reshape(n * h * w, 4 * c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]
    idx = (y0i * w + x0i + batch_off).reshape(-1)
    g = jnp.take(flat, idx, axis=0)
    g = g.reshape(out_shape + (4, c))

    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    wts = jnp.stack([w00, w01, w10, w11], axis=-2)  # (..., 4, 1)
    return jnp.sum(g * wts.astype(g.dtype), axis=-2)
