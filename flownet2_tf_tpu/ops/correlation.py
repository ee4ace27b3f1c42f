"""Correlation (cost-volume) op — TPU-native replacement for the reference's
CUDA ``Correlation`` / ``CorrelationGrad`` kernels.

Reference semantics (reference ``src/ops/correlation/correlation_kernel.cc``
REGISTER_OP "Correlation" and ``correlation_kernel.cu.cc`` CorrelateData;
Python shim ``src/correlation.py``):

* Inputs ``a, b``: NHWC float32, both zero-padded spatially by ``pad``.
* ``kernel_radius = (kernel_size - 1) // 2``;
  ``border = max_displacement + kernel_radius``.
* Displacement grid radius ``r = max_displacement // stride_2``; the grid is
  ``D = 2r + 1`` per axis, so ``D**2`` output channels (441 for the FlowNetC
  configuration ``k=1, d=20, s1=1, s2=2, pad=20``).
* Output spatial size: ``out = ceil((H + 2*pad - 2*border) / stride_1)``.
* ``out[n, y', x', (dy_i * D + dx_i)] =
      1/(K*K*C) * sum_{ky,kx,c} a_pad[n, y1+ky, x1+kx, c]
                               * b_pad[n, y1+dy+ky, x1+dx+kx, c]``
  with ``y1 = border + y'*stride_1``, ``dy = (dy_i - r)*stride_2``,
  window offsets ``ky, kx in [-kr, kr]``. Channel order is dy-major,
  dx-minor, matching the CUDA kernel's top_channel enumeration.

The oracle below is pure lax/jnp (a scan over the D^2 displacements with a
windowed reduction), differentiable by autodiff — it IS the numerics
contract. The Pallas path (ops/pallas/correlation_kernel.py) reformulates
the hot FlowNetC configuration as per-row MXU matmuls and carries a custom
VJP; it must match the oracle to float tolerance (tests/test_correlation.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from flownet2_tf_tpu.ops import dispatch


def correlation(
    input_a,
    input_b,
    kernel_size: int = 1,
    max_displacement: int = 20,
    stride_1: int = 1,
    stride_2: int = 2,
    pad: int = 20,
    implementation: str | None = None,
):
    """Cost volume between two NHWC feature maps.

    Drop-in equivalent of the reference Python shim
    ``src/correlation.py::correlation(a, b, kernel_size, max_displacement,
    stride_1, stride_2, pad)``.
    """
    if input_a.ndim != 4 or input_a.shape != input_b.shape:
        raise ValueError(
            f"correlation expects matching NHWC inputs, got "
            f"{input_a.shape} vs {input_b.shape}"
        )
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")

    impl = implementation or dispatch.get_implementation()
    if impl == "auto":
        # Measured on v5e (56x128x256, d=20): the XLA scan oracle runs at
        # ~0.4-1.7 ms vs the Pallas row kernel's ~0.6-1.9 ms (the kernel
        # re-streams each row D times; see pallas/correlation_kernel.py).
        # auto therefore keeps the oracle; pass implementation='pallas'
        # to use the kernel explicitly.
        impl = "oracle"
    if impl == "pallas":
        from flownet2_tf_tpu.ops.pallas.correlation_kernel import (
            correlation_pallas,
        )

        return correlation_pallas(
            input_a, input_b, kernel_size, max_displacement, stride_1,
            stride_2, pad,
        )
    return _correlation_oracle(
        input_a, input_b, kernel_size, max_displacement, stride_1, stride_2,
        pad,
    )


def _pallas_supported(shape, kernel_size, max_displacement, stride_1,
                      stride_2, pad):
    # Fast path covers the FlowNetC configuration family: pointwise kernel,
    # unit stride_1, pad == max_displacement.
    if not (kernel_size == 1 and stride_1 == 1 and pad == max_displacement):
        return False
    try:
        from flownet2_tf_tpu.ops.pallas import correlation_kernel  # noqa: F401
    except ImportError:
        return False
    return True


def correlation_output_shape(shape, kernel_size, max_displacement, stride_1,
                             stride_2, pad):
    n, h, w, c = shape
    kr = (kernel_size - 1) // 2
    border = max_displacement + kr
    out_h = int(math.ceil((h + 2 * pad - 2 * border) / stride_1))
    out_w = int(math.ceil((w + 2 * pad - 2 * border) / stride_1))
    r = max_displacement // stride_2
    d = 2 * r + 1
    return (n, out_h, out_w, d * d)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _correlation_oracle(a, b, kernel_size, max_displacement, stride_1,
                        stride_2, pad):
    n, h, w, c = a.shape
    kr = (kernel_size - 1) // 2
    border = max_displacement + kr
    _, out_h, out_w, top_c = correlation_output_shape(
        a.shape, kernel_size, max_displacement, stride_1, stride_2, pad
    )
    r = max_displacement // stride_2
    d = 2 * r + 1

    compute_dtype = jnp.promote_types(a.dtype, jnp.float32)
    a = a.astype(compute_dtype)
    b = b.astype(compute_dtype)

    # Zero-pad by `pad` (as the CUDA Pad<GPU> pass does for both inputs,
    # reference src/ops/correlation/pad.cu.cc), then pad b by an extra
    # max_displacement so every displacement shift is an in-bounds slice.
    s = max_displacement
    a_pad = jnp.pad(a, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    b_pad = jnp.pad(
        b, ((0, 0), (pad + s, pad + s), (pad + s, pad + s), (0, 0))
    )

    disp = jnp.array(
        [
            (dy * stride_2, dx * stride_2)
            for dy in range(-r, r + 1)
            for dx in range(-r, r + 1)
        ],
        dtype=jnp.int32,
    )

    # Region of the padded maps touched by the kernel windows:
    # window starts span [border - kr, border - kr + (out-1)*s1], i.e.
    # [max_displacement, ...]; extent (out-1)*s1 + K.
    y_lo = max_displacement
    ext_h = (out_h - 1) * stride_1 + kernel_size
    ext_w = (out_w - 1) * stride_1 + kernel_size

    a_roi = lax.dynamic_slice(
        a_pad, (0, y_lo, y_lo, 0), (n, ext_h, ext_w, c)
    )

    def one_displacement(_, dyx):
        dy, dx = dyx[0], dyx[1]
        b_shift = lax.dynamic_slice(
            b_pad,
            (0, s + y_lo + dy, s + y_lo + dx, 0),
            (n, ext_h, ext_w, c),
        )
        m = jnp.sum(a_roi * b_shift, axis=-1)  # (N, ext_h, ext_w)
        if kernel_size == 1 and stride_1 == 1:
            win = m
        else:
            win = lax.reduce_window(
                m,
                jnp.zeros((), m.dtype),
                lax.add,
                window_dimensions=(1, kernel_size, kernel_size),
                window_strides=(1, stride_1, stride_1),
                padding="VALID",
            )
        return None, win

    _, cv = lax.scan(one_displacement, None, disp)  # (D^2, N, out_h, out_w)
    cv = jnp.transpose(cv, (1, 2, 3, 0))
    norm = 1.0 / (kernel_size * kernel_size * c)
    return (cv * norm).astype(compute_dtype)
