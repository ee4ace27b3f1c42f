"""Bilinear backward warping — TPU-native replacement for the reference's
CUDA ``FlowWarp`` / ``FlowWarpGrad`` kernels.

Reference semantics (reference ``src/ops/flow_warp/flow_warp_op.cc``
REGISTER_OP "FlowWarp", ``flow_warp.cu.cc`` forward,
``flow_warp_grad.cu.cc`` backward; Python shim ``src/flow_warp.py``):

``warped[n, y, x, c] = image[n, y + v(y,x), x + u(y,x), c]`` sampled
bilinearly, with sample coordinates clamped to the image border
(border-replicate). The gradient w.r.t. the image is the scatter transpose
of the bilinear gather; the gradient w.r.t. the flow is the analytic
bilinear spatial derivative.

The implementation is the neighbor-packed gather (ops/sampling.py): one
gather of a 12-channel 4-tap record instead of four 3-channel gathers —
5-8x faster on TPU, identical numerics (clamp-first == per-neighbor
index clamping). Autodiff yields exactly the reference's two backward
kernels (scatter-add for d_image, analytic lerp derivative for
d_flow). ``border='zero'`` masks out-of-frame samples to 0 instead (the
Caffe FlowWarpLayer fill-zero variant) — kept as an option for parity
experiments; 'clamp' is the default, matching the TF1 port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.ops import dispatch
from flownet2_tf_tpu.ops.sampling import bilinear_gather, bilinear_gather_multi


def flow_warp(image, flow, border: str = "clamp",
              implementation: str | None = None, gather_dtype=None):
    """Warp ``image`` (NHWC) backward by ``flow`` (NHW2, (u, v) order).

    Drop-in equivalent of the reference shim
    ``src/flow_warp.py::flow_warp(image, flow)``.
    """
    if image.ndim != 4 or flow.ndim != 4 or flow.shape[-1] != 2:
        raise ValueError(
            f"flow_warp expects NHWC image and NHW2 flow, got "
            f"{image.shape} / {flow.shape}"
        )
    if image.shape[:3] != flow.shape[:3]:
        raise ValueError(
            f"image/flow spatial mismatch: {image.shape} vs {flow.shape}"
        )
    impl = implementation or dispatch.get_implementation()
    # The neighbor-packed XLA formulation IS the TPU-optimized kernel for
    # this op: Mosaic has no vectorized VMEM gather, so a hand-written
    # Pallas version would scalar-loop (measured rationale in
    # docs/DESIGN.md). 'pallas' therefore resolves to the same path.
    del impl
    return _flow_warp_oracle(image, flow, border, gather_dtype)


def flow_warp_multi(image, flows, border: str = "clamp",
                    gather_dtype=None):
    """Warp ONE image ((1, H, W, C)) by M flows ((M, H, W, 2)) at once.

    Builds the neighbor-packed gather table once and reuses it for all M
    flows — used by the FlowNet2 fusion stage, which warps the same
    ``input_b`` by the CSS and SD flows (reference ``src/flownet2/
    flownet2.py`` warps input_b twice). Returns (M, H, W, C).
    """
    if image.shape[0] != 1 or image.shape[1:3] != flows.shape[1:3]:
        raise ValueError(
            f"flow_warp_multi expects (1,H,W,C) image and (M,H,W,2) "
            f"flows, got {image.shape} / {flows.shape}"
        )
    return _flow_warp_multi_impl(image, flows, border, gather_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _flow_warp_multi_impl(image, flows, border, gather_dtype=None):
    n, h, w, c = image.shape
    if not jnp.issubdtype(image.dtype, jnp.floating):
        image = image.astype(jnp.float32)
    flows = flows.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x2 = xs + flows[..., 0]
    y2 = ys + flows[..., 1]
    out = bilinear_gather_multi(image, x2, y2, gather_dtype=gather_dtype)
    if border == "zero":
        inside = (
            (x2 >= 0.0) & (x2 <= w - 1) & (y2 >= 0.0) & (y2 <= h - 1)
        )
        out = out * inside[..., None].astype(out.dtype)
    return out


@functools.partial(jax.jit, static_argnums=(2, 3))
def _flow_warp_oracle(image, flow, border, gather_dtype=None):
    n, h, w, c = image.shape
    # Coordinates MUST be f32 (bf16 would quantize x~1024 to ~4 px);
    # gathered image data keeps its dtype (bf16 perf path halves gather
    # traffic, f32 parity path is exact).
    if not jnp.issubdtype(image.dtype, jnp.floating):
        image = image.astype(jnp.float32)
    flow = flow.astype(jnp.float32)

    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x2 = xs + flow[..., 0]
    y2 = ys + flow[..., 1]

    out = bilinear_gather(image, x2, y2, gather_dtype=gather_dtype)

    if border == "zero":
        inside = (
            (x2 >= 0.0) & (x2 <= w - 1) & (y2 >= 0.0) & (y2 <= h - 1)
        )
        out = out * inside[..., None].astype(out.dtype)
    return out
