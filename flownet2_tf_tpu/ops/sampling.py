"""Bilinear gather, TPU-shaped: the neighbor-packed formulation.

TPU XLA lowers per-pixel gathers of tiny (C=2..3 element) slices at
~1/100 of HBM bandwidth — each gathered row pads to a 128-lane vector.
Measured on v5e at 448x1024x3: four 3-element gathers = 12.3 ms; ONE
gather of a 4-neighbor-packed 12-element slice = 2.4 ms (1.5 ms bf16).

So: pre-pack ``Z[y, x] = [img[y,x], img[y,x+1], img[y+1,x],
img[y+1,x+1]]`` with three vectorized shifts (cheap, fused), gather Z
once at the floor coordinate, and lerp the four packed taps.

Border semantics: sample coordinates are clamped to [0, size-1] BEFORE
the floor split ("clamp-first"), which is algebraically identical to
clamping the four neighbor indices separately (border replicate, the
reference CUDA FlowWarp behavior) but keeps the packed gather exact at
the edges.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_gather(image, x2, y2):
    """Sample NHWC ``image`` at float coords (B, h, w), border-replicate.

    Returns (B, h, w, C). Differentiable in image and coords.
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

    flat = z.reshape(n, h * w, 4 * c)
    idx = (y0i * w + x0i).reshape(n, -1, 1)
    g = jnp.take_along_axis(flat, idx, axis=1)
    g = g.reshape(out_shape + (4, c))

    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    wts = jnp.stack([w00, w01, w10, w11], axis=-2)  # (..., 4, 1)
    return jnp.sum(g * wts.astype(g.dtype), axis=-2)
