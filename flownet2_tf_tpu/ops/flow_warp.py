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
import os as _os

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
    if impl not in dispatch._VALID:
        raise ValueError(
            f"bad kernel implementation {impl!r}; one of {dispatch._VALID}"
        )
    # The neighbor-packed XLA formulation IS the TPU-optimized kernel for
    # this op: Mosaic has no vectorized VMEM gather, so a hand-written
    # Pallas version would scalar-loop (measured rationale in
    # docs/DESIGN.md). Every valid impl resolves to the same path.
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


# ---------------------------------------------------------------------------
# Half-resolution warping (approximate, flag-gated)
# ---------------------------------------------------------------------------

def stack_warp_res() -> int:
    """The stack-warp coordinate-grid factor k: 1 (exact full-res),
    2 (half) or 4 (quarter).

    The full-res warp gather is issue-rate-bound inside XLA's gather
    emitter (~4.5 ns per gathered record regardless of record width —
    docs/DESIGN.md roofline), so a k-times-coarser coordinate grid cuts
    the cost ~k^2. The warped image is bilinearly upsampled back to
    full resolution. k>1 is an APPROXIMATION: the warped image loses
    high frequencies (the stage flows themselves are upsampled
    quarter-res fields, so the flow input is less affected). Default
    k=1; the serving preset uses k=2 for a ~1.5x speedup at a measured
    AEE delta within +-0.011 px across curricula (r3 192x256 weights:
    +0.006 to +0.011 px; r4 320x448 weights: -0.010 px, k=2 slightly
    BETTER — docs/DESIGN.md, results.json::{halfres_warp,warp_res_ab});
    k=4 measured and rejected per benchmarks/warp_res_ab.py.

    Resolution order: ``dispatch.use_warp_res`` override >
    ``dispatch.use_half_res_warp`` override > ``FLOWNET2_TPU_WARP_RES``
    env > ``FLOWNET2_TPU_HALF_RES_WARP`` env > 1.
    """
    k = dispatch.get_warp_res()
    if k is not None:
        return int(k)
    override = dispatch.get_half_res_warp()
    if override is not None:
        return 2 if override else 1
    env_k = _os.environ.get("FLOWNET2_TPU_WARP_RES", "")
    if env_k:
        try:
            k = int(env_k)
        except ValueError:
            k = None  # non-numeric ('half', ...) -> the friendly message
        if k not in dispatch._WARP_RES_VALID:
            raise ValueError(
                f"FLOWNET2_TPU_WARP_RES must be one of "
                f"{dispatch._WARP_RES_VALID}, got {env_k!r}"
            )
        return k
    if _os.environ.get("FLOWNET2_TPU_HALF_RES_WARP", "0") == "1":
        return 2
    return 1


def half_res_warp_enabled() -> bool:
    """Back-compat alias: whether stack warps run coarser than full
    res (see :func:`stack_warp_res`)."""
    return stack_warp_res() > 1


# The 2x2 pool feeding every half-res warp admits five XLA lowerings.
# r3 A/B'd four IN-MODEL (benchmarks/pool_ab.py — FlowNet2 448x1024 b1
# bf16 serving): reshape 14.17 < window 14.45 < conv 14.67 << slices
# 18.34 ms/pair, and kept the reshape-mean: its cost is dominated by
# the f32 input relayout every STANDALONE lowering pays. r4 added
# ``fold`` (phase mean of the conv-lowered space-to-depth fold,
# common.space_to_depth) and measured it NEUTRAL in-model (b1
# 14.51 vs 14.37, b8 13.02 vs 12.97 ms/pair): the model's own fold
# emits bf16 (the convert fuses into the conv) while the pool needs
# f32, so XLA compiles a second fold instead of CSE'ing — reshape
# stays the default. The structural fix that DOES share the fold is
# the ``image_s2d`` plumbing (_coarse_warp_s2d), which removed the
# standalone pool from the serving graph entirely. All five lowerings
# are the same sum-of-4-then-*0.25 up to float reassociation (pinned
# by tests/test_ops_oracle.py::test_pool2_impls).
_POOL2_VALID = ("reshape", "window", "slices", "conv", "fold")
_POOL2_IMPL = _os.environ.get("FLOWNET2_TPU_POOL2", "reshape")
if _POOL2_IMPL not in _POOL2_VALID:
    # Fail at import, not silently fall through to "reshape": the knob
    # exists to produce labeled A/B timings, and a typo'd value that
    # quietly measures the default corrupts exactly that data.
    raise ValueError(
        f"FLOWNET2_TPU_POOL2 must be one of {_POOL2_VALID}, "
        f"got {_POOL2_IMPL!r}"
    )


def _pool2(x):
    """Exact 2x2 area downsample (H, W even — guaranteed by the %64
    input contract). Lowering picked by FLOWNET2_TPU_POOL2 (see above);
    all variants are numerically equivalent up to f32 reassociation."""
    n, h, w, c = x.shape
    impl = _POOL2_IMPL
    if impl == "window":
        s = jax.lax.reduce_window(
            x, jnp.zeros((), x.dtype), jax.lax.add,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        )
        return s * jnp.asarray(0.25, x.dtype)
    if impl == "slices":
        s = (
            x[:, 0::2, 0::2] + x[:, 0::2, 1::2]
            + x[:, 1::2, 0::2] + x[:, 1::2, 1::2]
        )
        return s * jnp.asarray(0.25, x.dtype)
    if impl == "fold":
        # phase mean of the S2D fold; CSEs with the model's own fold of
        # the same image on the serving S2D path (see knob comment)
        from flownet2_tf_tpu.models.common import space_to_depth

        s = space_to_depth(x)  # (n, h/2, w/2, 4c) phase-major
        return s.reshape(n, h // 2, w // 2, 4, c).mean(axis=3)
    if impl == "conv":
        # sum-of-4 as a 2x2/2 identity conv (HIGHEST so 1.0*x is exact
        # even on the f32 path — common.py S2D-fold precedent), scaled
        # after, preserving the sum-then-scale rounding order.
        eye = jnp.eye(c, dtype=x.dtype)
        k = jnp.broadcast_to(eye[None, None], (2, 2, c, c))
        s = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=x.dtype,
        )
        return s * jnp.asarray(0.25, x.dtype)
    # "reshape": the original 5-D reshape + mean-reduce
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def _pool(x, k):
    """Exact k x k area downsample (k in {1, 2, 4}; H, W % k == 0,
    guaranteed by the %64 input contract)."""
    if k == 1:
        return x
    if k == 2:
        return _pool2(x)
    n, h, w, c = x.shape
    x = x.reshape(n, h // k, k, w // k, k, c)
    return x.mean(axis=(2, 4))


def _coarse_flow(flow_pooled, k):
    """Scale a k-pooled flow into coarse-grid pixels, compensating the
    pooled grid's (k-1)/2-px offset: pooled pixel j sits at full-res
    k*j + (k-1)/2 while the TF1 upsample (corner-aligned out_x/k
    mapping) reads coarse position x/k for output x — composing the
    two without compensation shifts the warp by exactly +(k-1)/2
    full-res px (the smooth-content unit test catches the shift as a
    first-order error; the k=2 constant -0.25 was verified there
    first)."""
    return flow_pooled * (1.0 / k) - (k - 1) / (2.0 * k)


def _warp_src_dtype(image_dtype):
    """Coarse-warp source-chain dtype: the dispatch knob, else the
    image's own floating dtype (non-float inputs promote to f32)."""
    if dispatch.get_warp_source_dtype() == "bfloat16":
        return jnp.bfloat16
    import numpy as _np

    if jnp.issubdtype(image_dtype, jnp.floating):
        return image_dtype
    return _np.float32


def flow_warp_coarse(image, flow, k, border: str = "clamp",
                     gather_dtype=None):
    """``flow_warp`` computed on a k x k-pooled image with the flow
    rescaled into coarse pixels, bilinearly upsampled back to (H, W).
    ~k^2 fewer gather records; numerics differ from the full-res warp
    (see stack_warp_res)."""
    from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1

    n, h, w, c = image.shape
    image_c = _pool(image.astype(_warp_src_dtype(image.dtype)), k)
    flow_c = _coarse_flow(_pool(flow, k), k)
    warped_c = _flow_warp_oracle(image_c, flow_c, border, gather_dtype)
    return resize_bilinear_tf1(warped_c, h, w)


def flow_warp_half(image, flow, border: str = "clamp", gather_dtype=None):
    """``flow_warp_coarse`` at k=2 (the measured serving preset)."""
    return flow_warp_coarse(image, flow, 2, border, gather_dtype)


def flow_warp_multi_coarse(image, flows, k, border: str = "clamp",
                           gather_dtype=None):
    """Coarse-grid variant of :func:`flow_warp_multi`."""
    from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1

    n, h, w, c = image.shape
    image_c = _pool(image.astype(_warp_src_dtype(image.dtype)), k)
    flows_c = _coarse_flow(_pool(flows, k), k)
    warped_c = _flow_warp_multi_impl(image_c, flows_c, border, gather_dtype)
    return resize_bilinear_tf1(warped_c, h, w)


def flow_warp_multi_half(image, flows, border: str = "clamp",
                         gather_dtype=None):
    """:func:`flow_warp_multi_coarse` at k=2."""
    return flow_warp_multi_coarse(image, flows, 2, border, gather_dtype)


# ---------------------------------------------------------------------------
# S2D (phase-major) stack warps — the stage-2 assembly primitives
# ---------------------------------------------------------------------------
#
# The stage-2 / fusion S2D assembly (models/stacks.py) wants the warped
# image directly in space-to-depth form so the full-res row-major tensor
# (and its fold transpose) never materializes. The first formulation —
# one full-size gather driven by phase-SHAPED (n, h/2, w/2, 2, 2)
# coordinate arrays — was numerically exact but a measured 2x END-TO-END
# REGRESSION (FlowNet2 448x1024 b1 bf16: 24.9 -> 48.4 ms/pair): every
# tensor with (..., 2, 2[, c]) minor dims tiles onto the (8, 128) /
# (2, 128) vector layout at ~5-10% lane utilization, and the profile
# showed the lerp (4x 2.1 ms multiply_reduce fusions), the 7-D record
# reshapes (4x 1.9 ms) and their layout copies eating ~19 ms/pair.
#
# This formulation instead issues FOUR QUARTER-SIZE GATHERS, one per
# 2x2 phase (qy, qx), over ONE shared packed table. Each phase gather
# uses clean (1, h/2, w/2) coordinate arrays — exactly the shapes the
# proven-fast full-res warp uses, so the lerp fuses identically — and
# the phase outputs concatenate on channels, which IS phase-major S2D
# order. Total gathered records are unchanged (the gather is
# issue-rate-bound, ~4.5 ns/record: docs/DESIGN.md), so the gather cost
# stays flat while all phase-shaped relayouts disappear.

def _phase_xy(u, v, q, h2, w2):
    """Absolute sample coordinates of phase ``q`` = (qy, qx): full-res
    pixel (2y + qy, 2x + qx) displaced by that pixel's flow (u, v).
    ``u``/``v``: (n, h/2, w/2). Returns x2, y2 of the same shape."""
    qy, qx = divmod(q, 2)
    bx = (
        2.0 * jnp.arange(w2, dtype=jnp.float32) + float(qx)
    )[None, None, :]
    by = (
        2.0 * jnp.arange(h2, dtype=jnp.float32) + float(qy)
    )[None, :, None]
    return bx + u, by + v


def _phase_uv_enc(flow_s2d, q):
    """Phase-q (u, v) planes of an S2D-ENCODED (n, h/2, w/2, 8) flow
    (phase-major (qy, qx, (u, v)) channels): a pair of channel slices."""
    fe = flow_s2d.astype(jnp.float32)
    return fe[..., 2 * q], fe[..., 2 * q + 1]


def _phase_uv_full(flow, q):
    """Phase-q (u, v) planes of a full-res (n, h, w, 2) flow: strided
    spatial slices."""
    qy, qx = divmod(q, 2)
    f = flow.astype(jnp.float32)
    return f[:, qy::2, qx::2, 0], f[:, qy::2, qx::2, 1]


def _s2d_warp_one(flat, uv_of_phase, h, w, c, border, h2, w2):
    """Warp one sample from its packed table ``flat``: 4 phase gathers,
    channel-concatenated -> (1, h/2, w/2, 4c) phase-major."""
    from flownet2_tf_tpu.ops.sampling import _gather_lerp

    phases = []
    for q in range(4):
        u, v = uv_of_phase(q)
        x2, y2 = _phase_xy(u, v, q, h2, w2)
        xc = jnp.clip(x2, 0.0, w - 1)
        yc = jnp.clip(y2, 0.0, h - 1)
        g = _gather_lerp(flat, xc, yc, w, c)
        if border == "zero":
            inside = (
                (x2 >= 0.0) & (x2 <= w - 1) & (y2 >= 0.0) & (y2 <= h - 1)
            )
            g = g * inside[..., None].astype(g.dtype)
        phases.append(g)
    return jnp.concatenate(phases, axis=-1)


def _pool2_from_s2d(x_s2d):
    """2x2 area pool of the DECODED tensor, computed from its S2D form:
    the mean over the 4 phase values of each cell. (n, h, w, 4c) ->
    (n, h, w, c)."""
    n, h, w, c4 = x_s2d.shape
    c = c4 // 4
    return x_s2d.reshape(n, h, w, 4, c).mean(axis=3)


def _coarse_warp_s2d(image, flow_src, pool_flow, warp_impl, border,
                     gather_dtype, k, image_s2d=None):
    """The shared coarse-grid (k=2/4) branch of every stack_warp_s2d*
    variant: pool the image by k, rescale the pooled flow into coarse
    pixels with the grid-offset compensation (derivation:
    _coarse_flow), warp on the coarse grid, then bring the result back
    in S2D-encoded (h/2-grid, phase-major) form. For k=2 the 2x
    upsample is emitted analytically (s2d_encode_upsample2x — no
    resize gather); for k=4 one real TF1 2x resize lifts h/4 -> h/2
    first (dyadic TF1 resizes compose exactly, so resize2x followed by
    the encoded 2x equals the 4x upsample). One home for the offset
    constant and its correctness argument.

    ``image_s2d``: optional f32 S2D-encoded form of ``image``
    ((n, h/2, w/2, 4c), phase-major). When the caller already folded
    the image (the stage-2/fusion assemblies do, for their concat
    blocks), the pool becomes a phase mean of that SHARED fold instead
    of a standalone full-res 5-D reshape+reduce. Measured r4: removes
    the pool rows from the serving trace entirely (fold grows
    6.41 -> 4.46 ms/batch at b8, net graph simplification) but is
    BENCH-NEUTRAL (b8 12.979 vs 12.971 ms/pair) — the scanned bench
    graph's layout solver had already made the standalone pool cheap;
    the unscanned 3-call trace r3's ledger was built from overstated
    it (docs/DESIGN.md "Profile-reading lesson #2"). Kept: one fold
    feeding pool+concat is the simpler graph and the hook for
    narrower-dtype warp sources. Same area average up to f32
    reassociation (coarse path only — the k=1 exact path never
    pools)."""
    from flownet2_tf_tpu.models.common import s2d_encode_upsample2x
    from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1

    n, h, w, _c = image.shape
    src_dtype = _warp_src_dtype(image.dtype)
    if image_s2d is not None:
        # the bf16 cast of the shared fold is free: the model's concat
        # consumer already forces a bf16-output fold under the serving
        # preset, so XLA CSEs the two (dispatch.get_warp_source_dtype)
        image_c = _pool_from_s2d(image_s2d.astype(src_dtype), k)
    else:
        image_c = _pool(image.astype(src_dtype), k)
    flow_c = _coarse_flow(pool_flow(flow_src, k), k)
    warped_c = warp_impl(image_c, flow_c, border, gather_dtype)
    if k == 4:
        warped_c = resize_bilinear_tf1(warped_c, h // 2, w // 2)
    return s2d_encode_upsample2x(warped_c)


def _pool_full(flow, k):
    """k-pool a full-res (n, h, w, 2) flow."""
    return _pool(flow, k)


def _pool_from_s2d(flow_s2d, k):
    """k-pool the DECODED flow from its S2D-encoded (n, h/2, w/2, 8)
    form: the phase mean IS the 2x pool; k=4 pools the result 2x more."""
    pooled2 = _pool2_from_s2d(flow_s2d)
    return pooled2 if k == 2 else _pool2(pooled2)


def stack_warp_s2d(image, flow, border: str = "clamp", gather_dtype=None):
    """:func:`stack_warp` emitting the S2D-encoded warped image.

    Returns (n, h/2, w/2, 4c) phase-major — exactly
    ``space_to_depth(stack_warp(image, flow))`` (bitwise for the
    full-res path; the half-res path matches its upsample to float
    rounding). Used by the stage-2/fusion S2D assembly
    (models/stacks.py) so the full-res warped image never materializes
    in row-major layout."""
    k = stack_warp_res()
    if k > 1:
        return _coarse_warp_s2d(image, flow, _pool_full,
                                _flow_warp_oracle, border, gather_dtype, k)
    return _stack_warp_s2d_full(image, flow, border, gather_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _stack_warp_s2d_full(image, flow, border, gather_dtype=None):
    from flownet2_tf_tpu.ops.sampling import (
        _UNROLL_MAX_SAMPLES, _pack_table)

    n, h, w, c = image.shape
    h2, w2 = h // 2, w // 2
    if not jnp.issubdtype(image.dtype, jnp.floating):
        image = image.astype(jnp.float32)
    if n > _UNROLL_MAX_SAMPLES:
        # large (augmentation-path) batches roll into one lax.map body —
        # same rationale as sampling.bilinear_gather (ADVICE r2): each
        # mapped gather still sees a single-sample operand (fast
        # emitter regime) without N unrolled subgraphs in the HLO.
        def one(args):
            img_i, fl_i = args
            flat = _pack_table(img_i[None], gather_dtype)
            return _s2d_warp_one(
                flat, lambda q: _phase_uv_full(fl_i[None], q),
                h, w, c, border, h2, w2,
            )[0]

        return jax.lax.map(one, (image, flow))
    outs = []
    for i in range(n):
        flat = _pack_table(image[i : i + 1], gather_dtype)
        outs.append(
            _s2d_warp_one(
                flat,
                lambda q: _phase_uv_full(flow[i : i + 1], q),
                h, w, c, border, h2, w2,
            )
        )
    return outs[0] if n == 1 else jnp.concatenate(outs, axis=0)


def stack_warp_s2d_enc(image, flow_s2d, border: str = "clamp",
                       gather_dtype=None, image_s2d=None):
    """:func:`stack_warp_s2d` taking the flow in S2D-ENCODED form
    ((n, h/2, w/2, 8), phase-major) — the form the stage assembly
    already has (models/stacks.py::_stage_flow_s2d), so the full-res
    row-major flow never materializes; each phase's (u, v) is a channel
    slice. ``image_s2d``: optional f32 S2D form of ``image``; lets the
    coarse (k>1) path pool via a phase mean of the caller's existing
    fold (see :func:`_coarse_warp_s2d`). Ignored at k=1."""
    k = stack_warp_res()
    if k > 1:
        return _coarse_warp_s2d(image, flow_s2d, _pool_from_s2d,
                                _flow_warp_oracle, border, gather_dtype, k,
                                image_s2d=image_s2d)
    return _stack_warp_s2d_enc_full(image, flow_s2d, border, gather_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _stack_warp_s2d_enc_full(image, flow_s2d, border, gather_dtype=None):
    from flownet2_tf_tpu.ops.sampling import (
        _UNROLL_MAX_SAMPLES, _pack_table)

    n, h, w, c = image.shape
    h2, w2 = h // 2, w // 2
    if not jnp.issubdtype(image.dtype, jnp.floating):
        image = image.astype(jnp.float32)
    if n > _UNROLL_MAX_SAMPLES:
        # see _stack_warp_s2d_full: bounded HLO at augmentation batches
        def one(args):
            img_i, fe_i = args
            flat = _pack_table(img_i[None], gather_dtype)
            return _s2d_warp_one(
                flat, lambda q: _phase_uv_enc(fe_i[None], q),
                h, w, c, border, h2, w2,
            )[0]

        return jax.lax.map(one, (image, flow_s2d))
    outs = []
    for i in range(n):
        flat = _pack_table(image[i : i + 1], gather_dtype)
        outs.append(
            _s2d_warp_one(
                flat,
                lambda q: _phase_uv_enc(flow_s2d[i : i + 1], q),
                h, w, c, border, h2, w2,
            )
        )
    return outs[0] if n == 1 else jnp.concatenate(outs, axis=0)


def stack_warp_multi_s2d_enc(image, flows_s2d, border: str = "clamp",
                             gather_dtype=None, image_s2d=None):
    """Multi-flow :func:`stack_warp_s2d_enc`: ONE ((1, h, w, c)) image,
    M S2D-encoded flows ((M, h/2, w/2, 8)), one shared packed table
    (the FlowNet2 fusion double warp). Returns (M, h/2, w/2, 4c).
    ``image_s2d``: see :func:`stack_warp_s2d_enc`."""
    if image.shape[0] != 1:
        # the packed table's flat index only addresses sample 0's rows —
        # a batched image would silently warp image[0] for every flow
        raise ValueError(
            f"stack_warp_multi_s2d_enc expects a (1, H, W, C) image, "
            f"got {image.shape}"
        )
    k = stack_warp_res()
    if k > 1:
        return _coarse_warp_s2d(image, flows_s2d, _pool_from_s2d,
                                _flow_warp_multi_impl, border,
                                gather_dtype, k, image_s2d=image_s2d)
    return _stack_warp_multi_s2d_enc_full(image, flows_s2d, border,
                                          gather_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _stack_warp_multi_s2d_enc_full(image, flows_s2d, border,
                                   gather_dtype=None):
    from flownet2_tf_tpu.ops.sampling import _pack_table

    n, h, w, c = image.shape
    h2, w2 = h // 2, w // 2
    m = flows_s2d.shape[0]
    if not jnp.issubdtype(image.dtype, jnp.floating):
        image = image.astype(jnp.float32)
    flat = _pack_table(image, gather_dtype)
    outs = [
        _s2d_warp_one(
            flat,
            lambda q: _phase_uv_enc(flows_s2d[j : j + 1], q),
            h, w, c, border, h2, w2,
        )
        for j in range(m)
    ]
    return outs[0] if m == 1 else jnp.concatenate(outs, axis=0)


def stack_warp_multi_s2d(image, flows, border: str = "clamp",
                         gather_dtype=None):
    """Multi-flow :func:`stack_warp_s2d` (FlowNet2 fusion double warp):
    one packed table, M x 4 phase gathers. Returns (M, h/2, w/2, 4c)."""
    if image.shape[0] != 1:
        # see stack_warp_multi_s2d_enc: flat index addresses sample 0 only
        raise ValueError(
            f"stack_warp_multi_s2d expects a (1, H, W, C) image, "
            f"got {image.shape}"
        )
    k = stack_warp_res()
    if k > 1:
        return _coarse_warp_s2d(image, flows, _pool_full,
                                _flow_warp_multi_impl, border,
                                gather_dtype, k)
    return _stack_warp_multi_s2d_full(image, flows, border, gather_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _stack_warp_multi_s2d_full(image, flows, border, gather_dtype=None):
    from flownet2_tf_tpu.ops.sampling import _pack_table

    n, h, w, c = image.shape
    h2, w2 = h // 2, w // 2
    m = flows.shape[0]
    if not jnp.issubdtype(image.dtype, jnp.floating):
        image = image.astype(jnp.float32)
    flat = _pack_table(image, gather_dtype)
    outs = [
        _s2d_warp_one(
            flat,
            lambda q: _phase_uv_full(flows[j : j + 1], q),
            h, w, c, border, h2, w2,
        )
        for j in range(m)
    ]
    return outs[0] if m == 1 else jnp.concatenate(outs, axis=0)


def stack_warp(image, flow, border: str = "clamp", gather_dtype=None):
    """The warp used at STACK boundaries (second-stage inputs, fusion
    branches): full-res flow_warp, or the coarse-grid approximation at
    the configured factor (stack_warp_res)."""
    k = stack_warp_res()
    if k > 1:
        return flow_warp_coarse(image, flow, k, border, gather_dtype)
    return flow_warp(image, flow, border, gather_dtype=gather_dtype)


def stack_warp_multi(image, flows, border: str = "clamp",
                     gather_dtype=None):
    """Multi-flow stack warp (FlowNet2 fusion double warp)."""
    k = stack_warp_res()
    if k > 1:
        return flow_warp_multi_coarse(image, flows, k, border, gather_dtype)
    return flow_warp_multi(image, flows, border, gather_dtype=gather_dtype)


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
