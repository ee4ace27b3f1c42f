"""Bilinear resize with TF1 ``align_corners=False`` semantics.

The reference upsamples the final ``predict_flow2 * 20`` to input
resolution with ``tf.image.resize_bilinear`` (reference
``src/flownet_s/flownet_s.py`` model(), end of decoder). TF1's default
(align_corners=False, pre-half-pixel-centers) maps destination pixel i to
source coordinate ``i * (in / out)`` — NOT the half-pixel convention that
``jax.image.resize`` uses — and clamps at the border. Getting this exactly
right is one of the survey's named parity traps (SURVEY.md §7 hard part 2),
so it is implemented from scratch here with a parity test against
``tf.compat.v1.image.resize_bilinear``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear_tf1(x, out_h: int, out_w: int):
    """Resize NHWC ``x`` to (out_h, out_w), TF1 align_corners=False rules."""
    if x.ndim != 4:
        raise ValueError(f"expected NHWC, got {x.shape}")
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    x = x.astype(compute_dtype)

    scale_y = h / out_h
    scale_x = w / out_w
    src_y = jnp.arange(out_h, dtype=compute_dtype) * scale_y
    src_x = jnp.arange(out_w, dtype=compute_dtype) * scale_x

    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (src_y - y0.astype(compute_dtype))[None, :, None, None]
    wx = (src_x - x0.astype(compute_dtype))[None, None, :, None]

    rows0 = jnp.take(x, y0, axis=1)
    rows1 = jnp.take(x, y1, axis=1)

    def horiz(rows):
        left = jnp.take(rows, x0, axis=2)
        right = jnp.take(rows, x1, axis=2)
        return left * (1.0 - wx) + right * wx

    top = horiz(rows0)
    bot = horiz(rows1)
    return top * (1.0 - wy) + bot * wy
