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
contract. The performance path is ``_correlation_mxu`` (batched einsum +
skew-reshape band extraction; selected by 'auto' when the configuration
supports it). Measured story (v5e, FlowNetC 448x1024 feature shapes,
benchmarks/results.json): ISOLATED, the Pallas row kernel edges out mxu
(0.97 vs 1.09 ms, oracle 1.25); IN-MODEL (FlowNetC end-to-end forward,
b1 bf16, "correlation_in_model_flownetc"), mxu wins decisively —
2.94-2.99 ms total vs 3.72 oracle and 4.11 pallas, i.e. the Pallas
custom call costs ~1.1 ms more in context than its isolated win
predicts (layout constraints + lost fusion with the producer convs).
'auto' therefore selects mxu; the Pallas kernel remains the
interpret-mode sanitizer. All implementations must match the oracle to
float tolerance (tests/test_correlation.py, tests/test_pallas_kernels.py).
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
    if impl not in dispatch._VALID:
        # the env/thread-local paths validate in dispatch; the explicit
        # argument must too — a typo'd impl silently falling through to
        # the oracle would publish oracle numbers under the wrong name
        raise ValueError(
            f"bad kernel implementation {impl!r}; one of {dispatch._VALID}"
        )
    if impl == "auto":
        # Measured on v5e (1x56x128x256, d=20, the FlowNetC shape at
        # 448x1024): MXU einsum+skew 'mxu' wins over the XLA scan oracle
        # and over the Pallas VPU row kernel (both of which are
        # VPU-compute-bound at the same throughput class); see
        # _correlation_mxu and benchmarks/results.json "ops". auto picks
        # 'mxu' where the configuration is supported, 'oracle' otherwise.
        if _mxu_supported(kernel_size, max_displacement, stride_1, stride_2,
                          pad):
            impl = "mxu"
        else:
            impl = "oracle"
    if impl == "mxu":
        # explicit 'mxu' (arg or FLOWNET2_TPU_KERNELS) gets the same
        # support guard as 'auto': the fast path only implements the
        # FlowNetC configuration family, and silently wrong cost
        # volumes are worse than the oracle's speed.
        if _mxu_supported(kernel_size, max_displacement, stride_1,
                          stride_2, pad):
            return _correlation_mxu(
                input_a, input_b, kernel_size, max_displacement, stride_1,
                stride_2, pad,
            )
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


def _mxu_supported(kernel_size, max_displacement, stride_1, stride_2, pad):
    # MXU fast path covers the FlowNetC configuration family: pointwise
    # kernel, unit stride_1, pad == max_displacement, displacement grid
    # aligned to stride_2.
    return (
        kernel_size == 1
        and stride_1 == 1
        and pad == max_displacement
        and max_displacement % stride_2 == 0
    )


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
def _correlation_mxu(a, b, kernel_size, max_displacement, stride_1,
                     stride_2, pad):
    """Cost volume as D batched matmuls + skew-reshape band extraction.

    The TPU-winning formulation. For each vertical displacement dy, ONE
    batched (W, C) x (C, W + 2d) matmul per image row computes ALL
    pairwise pixel dot products ``M[.., x, z] = sum_c a[.., x, c] *
    b_pad[.. + dy, z, c]`` on the 128x128 systolic array. The D cost
    channels are the stride-s2 diagonals ``M[.., x, x + dx]`` — dug out
    with the skew trick: pad the last dim by 1, flatten the last two
    dims, re-view with row stride (W + 2d + 2); the stride mismatch of
    +1 per row shears the matrix so diagonals land in columns. Pure
    static pad/reshape/slice — no gather, autodiff-transparent, and XLA
    keeps the matmuls on the MXU (~12.5% of M is kept at FlowNetC
    shapes; the MXU's throughput edge over any VPU product+reduce
    formulation dwarfs the discard). Measured on v5e at (1,56,128,256):
    ~3x over the lax.scan oracle; see benchmarks/results.json.
    """
    n, h, w, c = a.shape
    s = max_displacement
    r = s // stride_2
    d = 2 * r + 1
    wp = w + 2 * s

    acc = jnp.promote_types(a.dtype, jnp.float32)
    b_pad = jnp.pad(b, ((0, 0), (s, s), (s, s), (0, 0)))
    inv_norm = jnp.asarray(1.0 / c, acc)
    # f32 inputs = the parity path: force true-f32 MXU passes (XLA's
    # DEFAULT precision rounds matmul operands to bf16 on TPU). bf16
    # inputs = the perf path: single-pass bf16 with f32 accumulation.
    precision = (
        lax.Precision.HIGHEST if a.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )

    outs = []
    for dyi in range(d):
        bs = lax.dynamic_slice(
            b_pad, (0, dyi * stride_2, 0, 0), (n, h, wp, c)
        )
        m = jnp.einsum(
            "nhwc,nhzc->nhwz", a, bs, preferred_element_type=acc,
            precision=precision,
        )  # (n, h, w, wp)
        # skew: out[..., x, k] = m[..., x, x + k*stride_2]
        mp = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, 1)))  # row len wp+1
        flat = mp.reshape(n, h, w * (wp + 1))
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, w)))
        sheared = flat.reshape(n, h, w, wp + 2)
        band = sheared[..., : 2 * s + 1]  # (n, h, w, 2s+1)
        if stride_2 > 1:
            band = band[..., ::stride_2]  # (n, h, w, d)
        outs.append(band)
    cv = jnp.concatenate(outs, axis=-1)  # dy-major channel order
    return cv * inv_norm


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
