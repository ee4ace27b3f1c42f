"""Pallas TPU kernel for the FlowNetC correlation (cost volume).

Covers the reference configuration family (``kernel_size=1, stride_1=1,
pad == max_displacement``; reference
``src/ops/correlation/correlation_kernel.cu.cc`` CorrelateData with the
FlowNetC attrs k=1, d=20, s1=1, s2=2, pad=20 -> 441 channels).

Formulation (VPU row kernel): pre-pad ``b`` spatially by
``max_displacement``; grid = (batch, D, H) over displacement-rows; each
program holds one row of ``a`` (W x C, VMEM) and the matching
dy-shifted row of padded ``b`` ((W + 2d) x C), and unrolls the D dx
shifts as static slices: ``out[x, j] = sum_c a[x, c] * b_row[x + j*s2,
c] / C``. All slicing is static, the channel reduction vectorizes on
the VPU over the 128-lane C axis, and the output block writes the
dy-major 441-channel group directly (channel order matches the CUDA
kernel's top_channel enumeration).

This kernel is VPU-compute-bound at the same throughput class as the
XLA scan oracle. In the r2/r3 isolated sweep it is actually the
fastest correlation impl (0.97 ms vs 1.09 mxu / 1.25 oracle at
FlowNetC 448x1024 shapes) — but IN-MODEL it loses by ~1.1 ms
(FlowNetC b1 bf16 end-to-end: mxu 2.94-2.99 ms, oracle 3.72, pallas
4.11; benchmarks/results.json "correlation_in_model_flownetc"): the
custom call pins operand layouts and blocks fusion with the producer
convs, costs the isolated microbench never sees. 'auto' therefore
dispatches to the mxu path. An in-kernel MXU
variant (one (W, C) x (C, W+2d) ``dot_general`` per row computing all
pairwise pixel dots, then masked-reduce diagonal extraction) was built
and measured SLOWER (3.8 ms): the band extraction touches W^2 lanes
per displacement on the VPU, which re-creates the cost the matmul was
supposed to remove. The formulation that actually puts this op on the
MXU and wins is the batched-einsum + skew-reshape extraction in
``ops/correlation.py::_correlation_mxu`` — kept OUTSIDE Pallas because
its wins come from XLA's batched matmul + layout ops, not from manual
tiling. This row kernel remains as the Pallas reference
implementation and interpret-mode sanitizer.

Gradients: ``jax.custom_vjp`` whose backward runs through the jnp
oracle's autodiff (same numerics contract; the fwd kernel itself is
validated against the oracle in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_row_kernel(a_ref, b_ref, out_ref, *, dgrid: int, stride_2: int,
                     inv_norm: float):
    a = a_ref[0, 0]          # (W, C)
    b = b_ref[0, 0]          # (W + 2*max_disp, C)
    w = a.shape[0]
    acc_dtype = jnp.float32
    cols = []
    for j in range(dgrid):
        shift = j * stride_2
        prod = a.astype(acc_dtype) * b[shift : shift + w].astype(acc_dtype)
        cols.append(jnp.sum(prod, axis=-1) * inv_norm)  # (W,)
    out_ref[0, 0, 0] = jnp.stack(cols, axis=-1)  # (W, dgrid)


def _correlation_pallas_fwd(a, b, max_displacement: int, stride_2: int):
    n, h, w, c = a.shape
    r = max_displacement // stride_2
    d = 2 * r + 1
    pad = max_displacement

    b_pad = jnp.pad(b, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wp = w + 2 * pad

    kernel = functools.partial(
        _corr_row_kernel,
        dgrid=d,
        stride_2=stride_2,
        inv_norm=1.0 / c,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, d, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, w, c),
                lambda ni, dy, y: (ni, y, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wp, c),
                # padded row y + dy*stride_2 (block size 1 in the row dim
                # makes the element offset equal the index)
                lambda ni, dy, y, s2=stride_2: (ni, y + dy * s2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            # (n, dy, h, w, dx): last block dims (W, D) satisfy Mosaic's
            # tiling rule (W % 8 == 0; D equals the full array dim)
            (1, 1, 1, w, d),
            lambda ni, dy, y: (ni, dy, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, d, h, w, d), jnp.float32),
    )(a, b_pad)
    # -> (n, h, w, dy*D + dx), dy-major like the CUDA top_channel order
    return jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(n, h, w, d * d)


def pallas_correlation_supported(shape, kernel_size, max_displacement,
                                 stride_1, stride_2, pad) -> bool:
    n, h, w, c = shape
    return (
        kernel_size == 1
        and stride_1 == 1
        and pad == max_displacement
        and max_displacement % stride_2 == 0
        and w % 8 == 0
        and c % 128 == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def correlation_pallas(a, b, kernel_size=1, max_displacement=20,
                       stride_1=1, stride_2=2, pad=20):
    """Pallas cost volume; falls back to the oracle off the fast path."""
    if not pallas_correlation_supported(
        a.shape, kernel_size, max_displacement, stride_1, stride_2, pad
    ):
        from flownet2_tf_tpu.ops.correlation import _correlation_oracle

        return _correlation_oracle(
            a, b, kernel_size, max_displacement, stride_1, stride_2, pad
        )
    return _correlation_pallas_fwd(a, b, max_displacement, stride_2)


def _fwd(a, b, kernel_size, max_displacement, stride_1, stride_2, pad):
    out = correlation_pallas(
        a, b, kernel_size, max_displacement, stride_1, stride_2, pad
    )
    return out, (a, b)


def _bwd(kernel_size, max_displacement, stride_1, stride_2, pad,
         residuals, g):
    from flownet2_tf_tpu.ops.correlation import _correlation_oracle

    a, b = residuals
    _, vjp = jax.vjp(
        lambda x, y: _correlation_oracle(
            x, y, kernel_size, max_displacement, stride_1, stride_2, pad
        ),
        a,
        b,
    )
    da, db = vjp(g.astype(jnp.float32))
    return da.astype(a.dtype), db.astype(b.dtype)


correlation_pallas.defvjp(_fwd, _bwd)
