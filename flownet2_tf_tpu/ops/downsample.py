"""Area-average downsampling — TPU-native replacement for the reference's
CUDA ``Downsample`` kernel.

Reference semantics (reference ``src/ops/downsample/downsample_kernel.cc``
REGISTER_OP "Downsample" and ``downsample.cu.cc``; Python shim
``src/downsample.py``): resample an NHWC tensor to a target (h, w) by
averaging each output pixel's source footprint. Values are NOT rescaled —
the flow-magnitude convention is handled by the caller (the ``* 0.05``
scaling in each model's loss). Used only on the ground-truth path of the
multi-scale loss, so no gradient is required (autodiff through it works
anyway).

For integer downscale factors (the only case the multi-scale loss hits:
crop sizes are multiples of 64) this is an exact f x f average pool. The
general fractional case uses exact separable area weights built at trace
time.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def downsample(tensor, size):
    """Resample NHWC ``tensor`` to spatial ``size=(h, w)`` by area average.

    Drop-in equivalent of the reference shim
    ``src/downsample.py::downsample(tensor, size)``.
    """
    out_h, out_w = int(size[0]), int(size[1])
    return _downsample(tensor, out_h, out_w)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _downsample(tensor, out_h, out_w):
    if tensor.ndim != 4:
        raise ValueError(f"downsample expects NHWC, got {tensor.shape}")
    n, h, w, c = tensor.shape
    if (h, w) == (out_h, out_w):
        return tensor
    compute_dtype = jnp.promote_types(tensor.dtype, jnp.float32)
    x = tensor.astype(compute_dtype)

    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        pooled = lax.reduce_window(
            x,
            jnp.zeros((), x.dtype),
            lax.add,
            window_dimensions=(1, fh, fw, 1),
            window_strides=(1, fh, fw, 1),
            padding="VALID",
        )
        return pooled / (fh * fw)

    wh = jnp.asarray(_area_weights(h, out_h), dtype=compute_dtype)
    ww = jnp.asarray(_area_weights(w, out_w), dtype=compute_dtype)
    # out[n, i, j, c] = sum_{y,x} wh[i,y] ww[j,x] in[n,y,x,c].
    # HIGHEST precision: this feeds the loss numerics contract; default
    # matmul precision would round the area weights to bf16 on TPU.
    x = jnp.einsum("iy,nyxc->nixc", wh, x, precision=lax.Precision.HIGHEST)
    x = jnp.einsum("jx,nixc->nijc", ww, x, precision=lax.Precision.HIGHEST)
    return x


def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix of exact fractional-coverage area weights."""
    scale = in_size / out_size
    weights = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        lo, hi = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, in_size)):
            cover = min(hi, j + 1) - max(lo, j)
            if cover > 0:
                weights[i, j] = cover
        weights[i] /= weights[i].sum()
    return weights.astype(np.float32)
