"""Shared model substrate: functional conv blocks over nested-dict pytrees.

Design (TPU-first, not a port): parameters are plain nested dicts keyed by
the reference's layer names (``conv1``, ``deconv5``,
``upsample_flow6to5``, ...), so slim checkpoint scopes map 1:1 onto pytree
paths (reference scoping: ``FlowNet2/FlowNetCSS/FlowNetCS/FlowNetC/conv1/
weights``). All compute is pure jnp/lax, jittable end-to-end.

Padding conventions (the reference's parity-critical detail — it used
explicit ``pad()`` + VALID convs and ``antipad()`` after deconvs to
reproduce Caffe's symmetric padding, reference ``src/utils.py``):

* conv k x k, stride s: explicit symmetric spatial padding (k-1)//2. For
  stride-2 this is NOT the same sampling grid as TF 'SAME' (which pads
  asymmetrically); it IS Caffe's.
* deconv 4 x 4, stride 2: ``lax.conv_transpose`` with explicit padding
  [(1, 1), (1, 1)], which equals Caffe deconv pad=1 == the reference's
  VALID-deconv + antipad(1) crop, and yields exactly 2x upsampling.

Weight layouts: conv kernels HWIO (same as TF — converter-friendly);
deconv kernels HWIO in the *forward conv_transpose* sense (I = deconv
input channels). TF1 ``conv2d_transpose`` checkpoints store [H, W, out,
in] and apply the spatially-mirrored kernel; tools/convert_tf1_checkpoint
handles the re-layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

LEAK = 0.1


def leaky_relu(x, leak: float = LEAK):
    """LeakyReLU, slope 0.1 (reference ``src/utils.py::LeakyReLU``)."""
    return jnp.where(x >= 0, x, leak * x)


# Reference-named aliases (reference ``src/utils.py`` public surface).
# The conv/deconv blocks below fold pad/antipad into explicit conv
# padding, but the standalone utilities remain available for users
# porting custom heads.
LeakyReLU = leaky_relu


def pad(tensor, p: int = 1):
    """Symmetric NHWC spatial zero-pad (reference ``src/utils.py::pad``)."""
    return jnp.pad(tensor, ((0, 0), (p, p), (p, p), (0, 0)))


def antipad(tensor, p: int = 1):
    """Crop p from every spatial border — the inverse of :func:`pad`,
    used after VALID deconvs (reference ``src/utils.py::antipad``)."""
    return tensor[:, p:-p, p:-p, :]


def check_divisible_by_64(h: int, w: int):
    """The 6 stride-2 stages require H, W ≡ 0 (mod 64) — the reference's
    implicit input constraint. The inference runtime (training/infer.py)
    pads arbitrary sizes up and crops the flow back."""
    if h % 64 or w % 64:
        raise ValueError(
            f"input spatial size ({h}, {w}) must be divisible by 64; use "
            "flownet2_tf_tpu.training.infer (or the CLI), which pads and "
            "crops back automatically"
        )


@jax.custom_jvp
def _safe_sqrt(s):
    """sqrt with a finite (zero) derivative at s == 0, forward-exact.

    d/ds sqrt(s) -> inf at 0, and the stacked nets hit EXACT zeros
    there: at random init the *0.05-scaled stage flows quantize to 0.0
    in bf16 over large regions, making flow magnitude and brightness
    error (warped == input bitwise) exactly zero — a single
    value_and_grad through an UNFROZEN stack then returns inf/NaN
    weight grads (measured on TPU at 320x448 b8; the curriculum's
    frozen stages masked this because AD never entered the norms).
    custom_jvp rather than the double-where trick: the primal stays a
    bare sqrt (no select chains on full-res tensors) and only the
    tangent pays one select."""
    return jnp.sqrt(s)


@_safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (s,), (t,) = primals, tangents
    y = jnp.sqrt(s)
    dy = jnp.where(s > 0, 0.5 / jnp.maximum(y, jnp.finfo(y.dtype).tiny),
                   jnp.zeros_like(y))
    return y, dy * t


def channel_norm(x):
    """Per-pixel L2 norm across channels, keepdims -> (..., 1).

    Used for brightness error / flow magnitude in the stacked nets
    (reference ``src/flownet_cs/flownet_cs.py``, ``src/flownet2/
    flownet2.py``). Forward identical to sqrt(sum(x^2)); gradient
    guarded at exact zeros (see _safe_sqrt).
    """
    return _safe_sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _msra(key, shape, fan_in, dtype=jnp.float32):
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def conv_params(key, k, cin, cout, dtype=jnp.float32):
    """{'weights': (k, k, cin, cout), 'biases': (cout,)} — MSRA init."""
    return {
        "weights": _msra(key, (k, k, cin, cout), k * k * cin, dtype),
        "biases": jnp.zeros((cout,), dtype),
    }


def deconv_params(key, cin, cout, k=4, dtype=jnp.float32):
    return {
        "weights": _msra(key, (k, k, cin, cout), k * k * cin, dtype),
        "biases": jnp.zeros((cout,), dtype),
    }


# ---------------------------------------------------------------------------
# Functional layers
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


# Layer-name markers of the act=False f32 policy below: flow heads,
# flow upsamplers, and the unactivated interconv refinements.
_F32_LAYER_MARKERS = ("predict_flow", "upsample_flow", "interconv")


def cast_params_for_inference(params, compute_dtype=None):
    """Pre-cast feature-conv params to the bf16 compute dtype (serving).

    Under the bf16 policy every act=True conv casts its weights/biases
    to bf16 AT TRACE TIME (``_conv_io_dtypes``), so XLA re-executes the
    f32->bf16 converts — and streams the f32 master copies from HBM —
    on every forward call. For inference the cast can happen once, on
    the host: bitwise-identical outputs (bf16(x) == bf16(bf16(x)), and
    the S2D weight transforms are pure data movement), half the weight
    HBM traffic, no per-call converts. Flow heads / upsamplers /
    interconvs (the act=False layers, which compute in f32) keep f32.

    Training keeps full-precision masters; this is inference-only.
    """
    import jax.numpy as _jnp

    from flownet2_tf_tpu.ops import dispatch as _dispatch

    cd = _jnp.bfloat16 if compute_dtype is None else compute_dtype
    markers = _F32_LAYER_MARKERS
    if _dispatch.get_bf16_interconv():
        # serving preset: interconvs follow the bf16 policy, so their
        # weights pre-cast too (see dispatch.get_bf16_interconv)
        markers = tuple(m for m in markers if m != "interconv")

    def rec(d, in_f32_layer=False):
        out = {}
        for k, v in d.items():
            f32_layer = in_f32_layer or any(
                m in k for m in markers
            )
            if isinstance(v, dict):
                out[k] = rec(v, f32_layer)
            else:
                out[k] = v if f32_layer else v.astype(cd)
        return out

    return rec(params)


def _conv_io_dtypes(compute_dtype, act, interconv: bool = False):
    """Mixed-precision policy per layer kind.

    * feature layers (act=True) under a bf16 policy: bf16 in / bf16 out
      (XLA's TPU conv still accumulates f32 internally). Keeping the
      output dtype equal to the operand dtype is required for autodiff —
      a f32-output bf16-operand conv produces a mixed-dtype transposed
      conv in the backward pass, which lax rejects.
    * flow heads and flow upsamplers (act=False): full f32 — flow values
      need the precision and these layers are 2-channel (negligible
      cost).
    * f32 policy (compute_dtype None): f32 with HIGHEST precision (this
      environment's DEFAULT rounds conv operands to bf16 even on CPU,
      which would eat the <=1e-2 EPE parity budget). Feature layers can
      be dropped to DEFAULT precision via
      ``dispatch.use_f32_features_precision('default')`` — flow heads
      keep HIGHEST; measured speed/accuracy trade in docs/DESIGN.md.
    """
    f32_policy = compute_dtype is None or compute_dtype == jnp.float32
    if f32_policy:
        from flownet2_tf_tpu.ops import dispatch

        if act and dispatch.get_f32_features_precision() == "default":
            return jnp.float32, lax.Precision.DEFAULT
        return jnp.float32, lax.Precision.HIGHEST
    if not act:
        if interconv:
            from flownet2_tf_tpu.ops import dispatch

            if dispatch.get_bf16_interconv():
                # interconvs are feature-scale (SD interconv5 is
                # 1026->512); under the serving preset they follow the
                # bf16 policy — their flow head stays f32 regardless
                return compute_dtype, lax.Precision.DEFAULT
        return jnp.float32, lax.Precision.DEFAULT
    return compute_dtype, lax.Precision.DEFAULT


def _check_f32_master(w, io_dtype, where):
    """Trace-time guard: a layer whose policy resolves to f32 must see
    f32 master weights. A bf16 weight here means the params were
    pre-cast (cast_params_for_inference) under a DIFFERENT dispatch
    configuration than the current trace (e.g. use_bf16_interconv on at
    cast time, off now) — astype'ing the already-quantized copy back to
    f32 would silently run at bf16 weight precision while claiming the
    exact path."""
    if io_dtype == jnp.float32 and w.dtype == jnp.bfloat16:
        raise ValueError(
            f"{where}: f32-policy layer received bfloat16 weights — the "
            "param tree was pre-cast under a different dispatch "
            "configuration than the current trace; re-run "
            "cast_params_for_inference on the f32 masters under the "
            "active configuration"
        )


def conv(p, x, stride: int = 1, act: bool = True,
         compute_dtype=None, interconv: bool = False):
    """Caffe-padded conv + optional LeakyReLU (see _conv_io_dtypes)."""
    w = p["weights"]
    k = w.shape[0]
    pad = (k - 1) // 2
    io_dtype, precision = _conv_io_dtypes(compute_dtype, act, interconv)
    _check_f32_master(w, io_dtype, "conv")
    y = lax.conv_general_dilated(
        x.astype(io_dtype),
        w.astype(io_dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        precision=precision,
    )
    y = y + p["biases"].astype(io_dtype)
    if act:
        y = leaky_relu(y)
    return y


def deconv(p, x, act: bool = True, compute_dtype=None):
    """4x4 stride-2 transposed conv, Caffe pad=1 (exact 2x upsample).

    Implemented as an input-dilated conv: dilate the input by 2, pad the
    dilated grid by (k-1) - caffe_pad = 2 per side, unit-stride conv.
    Output size = (2*in - 1) + 4 - 4 + 1 = 2*in. This is the transpose of
    the stride-2 Caffe conv; the kernel is stored in forward-conv HWIO
    orientation (TF1 conv2d_transpose checkpoints are spatially mirrored
    with swapped in/out — handled by the converter, see
    tools/convert_tf1_checkpoint.py). Precision policy: _conv_io_dtypes.
    """
    if _DECONV_IMPL == "phase":
        # Phase lowering: the lhs-dilated conv multiplies zeros on 3/4
        # of its taps; emitting all 4 output phases from one unit-stride
        # 3x3 conv (deconv_s2d's transformed weights) and unfolding
        # keeps every MXU multiply live. Same 4 nonzero taps per output
        # element, so numerically identical up to accumulation-of-zeros
        # (tests/test_models.py::test_deconv_phase_matches_dilated).
        return depth_to_space(deconv_s2d(p, x, act, compute_dtype))
    w = p["weights"]
    io_dtype, precision = _conv_io_dtypes(compute_dtype, act)
    _check_f32_master(w, io_dtype, "deconv")
    y = lax.conv_general_dilated(
        x.astype(io_dtype),
        w.astype(io_dtype),
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=_DN,
        precision=precision,
    )
    y = y + p["biases"].astype(io_dtype)
    if act:
        y = leaky_relu(y)
    return y


def predict_flow(p, x, compute_dtype=None):
    """3x3 stride-1 2-channel conv, no activation (``predict_flowN``)."""
    return conv(p, x, stride=1, act=False, compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# Space-to-depth head convolutions (perf transform, numerically exact)
# ---------------------------------------------------------------------------
#
# Full-resolution low-channel convolutions are the worst-mapped ops in
# the FlowNet family on TPU: 3-14 input channels leave 90+% of the
# 128-lane VPU/MXU tiles idle and force layout copies around every
# full-res activation. The classic fix is space-to-depth: fold each 2x2
# spatial block into channels (H, W, C) -> (H/2, W/2, 4C) and rewrite
# the head conv's weights so the result is EXACTLY the same function
# (same multiply-adds, reassociated). Derivations and the measured
# equivalence live in benchmarks/s2d_experiments.py. The transform is
# linear in the weights, so autodiff trains the ORIGINAL parameter
# layout transparently and checkpoints stay reference-compatible.

import os as _os

# Escape hatches for A/B measurements; models read these at trace time.
# S2D_HEADS gates the 3x3 head pairs + the FlowNet2 fusion level-0
# chain (measured win on v5e: FlowNet2 25.3 -> 22.8 ms). The 7x7/2
# conv1 transform only pays when the input is wide enough to amortize
# the fold's strided transpose (~1 ms at full res): measured on v5e it
# LOSES on the 3-6 channel first-stage inputs (S: 1.74 -> 2.80 ms,
# C: 3.04 -> 4.04) but WINS inside FlowNet2, whose stage-2 conv1 sees
# the 12-channel warped concat (22.8 vs 23.5 ms) — hence the
# channel-count gate in use_s2d_head7. FLOWNET2_TPU_S2D7=0/1 forces
# it off/on everywhere.
S2D_HEADS = _os.environ.get("FLOWNET2_TPU_S2D", "1") != "0"
S2D_HEAD7 = _os.environ.get("FLOWNET2_TPU_S2D7", "")
S2D_HEAD7_MIN_CIN = 12


def s2d_heads() -> bool:
    """Whether the 3x3 head pairs / fusion level-0 chain fold to S2D.

    Reads the thread-local override from ``ops.dispatch.use_s2d`` first,
    then the module-global env default — models must call this at trace
    time instead of reading ``S2D_HEADS`` directly so two
    configurations can coexist in one process (ADVICE r2)."""
    from flownet2_tf_tpu.ops import dispatch

    override = dispatch.get_s2d_override()
    if override is not None:
        return bool(override)
    return S2D_HEADS


def use_s2d_head7(cin: int) -> bool:
    from flownet2_tf_tpu.ops import dispatch

    override = dispatch.get_s2d_override()
    if override is not None:
        return bool(override) and cin >= S2D_HEAD7_MIN_CIN
    if S2D_HEAD7 == "0":
        return False
    if S2D_HEAD7 == "1":
        return True
    return S2D_HEADS and cin >= S2D_HEAD7_MIN_CIN


def space_to_depth(x):
    """NHWC 2x2 block fold: (n, h, w, c) -> (n, h/2, w/2, 4c).

    Channel order is phase-major (qy, qx, c) — the weight transforms
    below assume it.

    Lowering is selected by FLOWNET2_TPU_S2D_FOLD: ``conv`` (default —
    a stride-2 2x2 identity conv; exact, every output element is
    1.0*x + zeros, routed through XLA's conv emitter) or ``transpose``
    (reshape/6-D transpose/reshape). Measured end-to-end in FlowNet2
    448x1024 b1 bf16 (benchmarks/s2d_impl_ab.py, v5e): conv 21.7
    ms/pair vs transpose 23.7/23.8 — the conv emitter eliminates the
    fold's explicit relayout copies.
    """
    if _S2D_FOLD == "conv":
        return _space_to_depth_conv(x)
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


_S2D_FOLD = _os.environ.get("FLOWNET2_TPU_S2D_FOLD", "conv")

# deconv lowering (see :func:`deconv`): "dilated" = lhs-dilated conv,
# "phase" = unit-stride conv emitting all 4 phases + depth_to_space.
# MEASURED r4, FlowNet2 448x1024 bf16 serving preset: phase LOSES
# in-model (b1 17.50 vs 14.65, b8 13.74 vs 12.98 ms/pair) — the MXU
# work the dilation "wastes" on zeros was not the binding cost; the
# depth_to_space relayout after every decoder level is. "dilated"
# stays the default; the knob remains for remeasurement on future XLA
# versions. Import-frozen (cannot join dispatch.trace_signature()).
_DECONV_VALID = ("dilated", "phase")
_DECONV_IMPL = _os.environ.get("FLOWNET2_TPU_DECONV", "dilated")
if _DECONV_IMPL not in _DECONV_VALID:
    raise ValueError(
        f"FLOWNET2_TPU_DECONV must be one of {_DECONV_VALID}, "
        f"got {_DECONV_IMPL!r}"
    )


def _s2d_fold_kernel(c, dtype):
    """(2, 2, c, 4c) identity kernel: K[qy, qx, ch, (qy*2+qx)*c + ch]=1."""
    import numpy as _np

    k = _np.zeros((2, 2, c, 4 * c), dtype=_np.float32)
    for qy in range(2):
        for qx in range(2):
            for ch in range(c):
                k[qy, qx, ch, (qy * 2 + qx) * c + ch] = 1.0
    return jnp.asarray(k, dtype=dtype)


def _space_to_depth_conv(x):
    n, h, w, c = x.shape
    return lax.conv_general_dilated(
        x,
        _s2d_fold_kernel(c, x.dtype),
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=_DN,
        # identity kernel: HIGHEST keeps 1.0*x exact (default precision
        # rounds operands to bf16)
        precision=lax.Precision.HIGHEST,
    )


def _s2d_w7(w):
    """(7,7,ci,o) -> (4,4,4ci,o) for the 7x7/2 pad-3 head.

    out(i,j) = sum_t W[ty,tx] x(2i+ty-3, 2j+tx-3); with S2D cell
    x(2(i+da-2)+qy, ...) the tap is ty = 2da+qy-1, da in [0,4) (taps
    outside [0,7) are zero), conv pad (2,1) per dim.
    """
    ci, o = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # index ty+1 in [0,8)
    wp = wp.reshape(4, 2, 4, 2, ci, o)  # [da, qy, db, qx, ci, o]
    return wp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * ci, o)


def _s2d_w3s1(w):
    """(3,3,ci,co) -> (3,3,4ci,4co) for a full-res 3x3/1 pad-1 conv,
    S2D input AND output (phase-major (py,px,co) output channels).

    Tap: ty = 2da+qy-py-1, da in [0,3)."""
    ci, co = w.shape[2], w.shape[3]
    blocks = []
    for py in range(2):
        row = []
        for px in range(2):
            # index (2da+qy) in [0,6); W entry at ty = 2da+qy-py-1
            wp = jnp.pad(
                w, ((py + 1, 2 - py), (px + 1, 2 - px), (0, 0), (0, 0))
            )  # (6,6,ci,co)
            wp = wp.reshape(3, 2, 3, 2, ci, co)
            row.append(wp.transpose(0, 2, 1, 3, 4, 5))  # (3,3,2,2,ci,co)
        blocks.append(row)
    # assemble (3,3, qy,qx,ci, py,px,co)
    out = jnp.stack(
        [jnp.stack(r, axis=0) for r in blocks], axis=0
    )  # (py, px, 3,3, qy,qx, ci, co)
    out = out.transpose(2, 3, 4, 5, 6, 0, 1, 7)
    return out.reshape(3, 3, 4 * ci, 4 * co)


def _s2d_w3s2(w):
    """(3,3,c,o) -> (2,2,4c,o) for a 3x3/2 pad-1 conv consuming S2D
    input. Tap: ty = 2da+qy-1, da in [0,2); conv pad (1,0) per dim."""
    c, o = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (4,4,c,o)
    wp = wp.reshape(2, 2, 2, 2, c, o)
    return wp.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, o)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`: (n, h, w, 4c) -> (n, 2h, 2w, c)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def _s2d_wdeconv4(w):
    """(4,4,ci,co) -> (3,3,ci,4co): the 4x4/2 pad-1 deconv (see
    :func:`deconv`) emitting S2D-encoded output at input resolution.

    deconv output: out(2i+py) = sum_ty w[ty] x[(2i+py+ty-2)/2] for
    py+ty even => phase py taps w[2dm-py] at input cell i+dm-1,
    dm in [0,3); conv pad (1,1)."""
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))  # index s+1, s in [-1,5)
    wp = wp.reshape(3, 2, 3, 2, ci, co)  # [dm, 1-py, dn, 1-px, ci, co]
    wp = wp[:, ::-1, :, ::-1]  # [dm, py, dn, px, ci, co]
    return wp.transpose(0, 2, 4, 1, 3, 5).reshape(3, 3, ci, 4 * co)


def deconv_s2d(p, x, act: bool = True, compute_dtype=None):
    """Drop-in for :func:`deconv` that returns the S2D-encoded output
    (same resolution as ``x``, 4x channels, phase-major)."""
    io_dtype, precision = _conv_io_dtypes(compute_dtype, act)
    _check_f32_master(p["weights"], io_dtype, "deconv_s2d")
    y = lax.conv_general_dilated(
        x.astype(io_dtype),
        _s2d_wdeconv4(p["weights"]).astype(io_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DN,
        precision=precision,
    )
    y = y + jnp.tile(p["biases"], 4).astype(io_dtype)
    if act:
        y = leaky_relu(y)
    return y


def conv3x3s1_s2d(p, x, in_splits=None, act: bool = True,
                  compute_dtype=None, interconv: bool = False):
    """Drop-in for a full-res 3x3/1 ``conv`` on an S2D-encoded input,
    returning the S2D-encoded output.

    ``in_splits``: original-channel sizes of the blocks whose S2D forms
    were concatenated to build ``x`` (e.g. (64, 16, 2) for a skip/
    deconv/flow concat) — each weight block is transformed separately
    because S2D(concat(A, B)) != concat(S2D(A), S2D(B)).
    """
    w = p["weights"]
    if in_splits is None:
        in_splits = (w.shape[2],)
    io_dtype, precision = _conv_io_dtypes(compute_dtype, act, interconv)
    _check_f32_master(w, io_dtype, "conv_s2d")
    parts = []
    off = 0
    for s in in_splits:
        parts.append(_s2d_w3s1(w[:, :, off : off + s]))
        off += s
    w2 = jnp.concatenate(parts, axis=2)
    y = lax.conv_general_dilated(
        x.astype(io_dtype),
        w2.astype(io_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DN,
        precision=precision,
    )
    y = y + jnp.tile(p["biases"], 4).astype(io_dtype)
    if act:
        y = leaky_relu(y)
    return y


def conv7x7s2_s2d(p, x, compute_dtype=None, in_splits=None,
                  x_is_s2d: bool = False):
    """Drop-in for ``conv(p, x, stride=2)`` with a 7x7 kernel: S2D the
    input, run an equivalent 4x4/1 conv on 4x channels.

    With ``x_is_s2d`` the caller supplies an already-S2D-encoded input
    built BLOCKWISE — ``concat([S2D(A), S2D(B), ...])`` with original
    channel counts ``in_splits`` — and no fold happens here. This is the
    stage-2 assembly path (models/stacks.py): the warped concat is
    assembled directly in S2D space, so the full-res 12-channel tensor
    (and its fold transpose) never materializes."""
    w = p["weights"]
    io_dtype, precision = _conv_io_dtypes(compute_dtype, True)
    if x_is_s2d:
        if in_splits is None:
            in_splits = (w.shape[2],)
        parts, off = [], 0
        for s in in_splits:
            parts.append(_s2d_w7(w[:, :, off : off + s]))
            off += s
        w2 = jnp.concatenate(parts, axis=2)
        x = x.astype(io_dtype)
    else:
        w2 = _s2d_w7(w)
        x = space_to_depth(x.astype(io_dtype))
    y = lax.conv_general_dilated(
        x,
        w2.astype(io_dtype),
        window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=_DN,
        precision=precision,
    )
    return leaky_relu(y + p["biases"].astype(io_dtype))


# channel_norm_s2d lowering: "slice" = per-phase channel slices +
# reduce (r3 form), "matmul" = square once, then ONE 1x1 conv with a
# 0/1 block-indicator kernel sums each phase's squares on the MXU —
# same adds, HIGHEST precision, same _safe_sqrt. The slice form's 4
# narrow reduces are a measurable loop-fusion cell in the serving
# ledger (results.json::op_ledger b8); the conv form routes the same
# bytes through the conv emitter's layouts. Import-frozen knob.
_CNORM_VALID = ("slice", "matmul")
_CNORM_IMPL = _os.environ.get("FLOWNET2_TPU_CNORM", "slice")
if _CNORM_IMPL not in _CNORM_VALID:
    raise ValueError(
        f"FLOWNET2_TPU_CNORM must be one of {_CNORM_VALID}, "
        f"got {_CNORM_IMPL!r}"
    )


def _phase_sum_kernel(c, dtype):
    """(1, 1, 4c, 4) block-indicator kernel: K[0,0,q*c+ch,q] = 1."""
    import numpy as _np

    k = _np.zeros((1, 1, 4 * c, 4), dtype=_np.float32)
    for q in range(4):
        k[0, 0, q * c : (q + 1) * c, q] = 1.0
    return jnp.asarray(k, dtype=dtype)


def channel_norm_s2d(x):
    """Per-phase :func:`channel_norm` of an S2D-encoded tensor.

    ``x``: (n, h, w, 4c) phase-major. Returns (n, h, w, 4) — exactly
    ``space_to_depth(channel_norm(depth_to_space(x)))``, computed
    without leaving S2D space. Per-phase channel slices (not a
    (..., 4, c) reshape, whose tiny minor dims tile at ~5% lane
    utilization — the r3 phase-shaped-warp lesson, ops/flow_warp.py
    S2D section). Alternative MXU lowering: _CNORM_IMPL."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    if _CNORM_IMPL == "matmul":
        s = lax.conv_general_dilated(
            jnp.square(x),
            _phase_sum_kernel(c, x.dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=_DN,
            # 0/1 kernel: HIGHEST keeps 1.0*sq exact (default rounds
            # operands to bf16 — the S2D-fold precedent)
            precision=lax.Precision.HIGHEST,
        )
        return _safe_sqrt(s)
    return jnp.concatenate(
        [
            _safe_sqrt(
                jnp.sum(
                    jnp.square(x[..., q * c : (q + 1) * c]),
                    axis=-1,
                    keepdims=True,
                )
            )
            for q in range(4)
        ],
        axis=-1,
    )


def s2d_encode_upsample2x(x):
    """TF1 bilinear 2x upsample of ``x`` emitted directly in S2D form.

    (n, h, w, c) -> (n, h, w, 4c) phase-major; exactly equals
    ``space_to_depth(resize_bilinear_tf1(x, 2h, 2w))``. For scale 2,
    TF1 align_corners=False maps output pixel 2i -> source i and
    2i+1 -> source i+0.5 (border-clamped), so the four phases are the
    identity and the three half-pixel averages — pure elementwise
    shifts, no resize gather and no fold transpose."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    x_r = xp[:, :h, 1 : w + 1]    # right neighbor (clamped)
    x_d = xp[:, 1 : h + 1, :w]    # down neighbor
    x_dr = xp[:, 1 : h + 1, 1 : w + 1]
    half = jnp.asarray(0.5, x.dtype)
    quarter = jnp.asarray(0.25, x.dtype)
    p00 = x
    p01 = half * (x + x_r)
    p10 = half * (x + x_d)
    p11 = quarter * (x + x_r + x_d + x_dr)
    return jnp.concatenate([p00, p01, p10, p11], axis=-1)


def conv_pair3x3_s2d(p0, p1, x, compute_dtype=None,
                     return_intermediate: bool = False,
                     in_splits=None, x_is_s2d: bool = False):
    """Drop-in for ``conv1(conv0(x))`` where conv0 is a full-res 3x3/1
    and conv1 a 3x3/2 (the FlowNetSD conv0/conv1 and FlowNet2
    fuse_conv0/fuse_conv1 heads): both run in S2D space, so no full-res
    activation is ever materialized. Output equals the plain pair's
    half-res conv1 output exactly. With ``return_intermediate`` also
    returns conv0's S2D-encoded activation (for decoder skips that
    consume it — e.g. FlowNet2's fuse_conv0 -> fuse_interconv0 path).
    ``x_is_s2d``/``in_splits``: as :func:`conv7x7s2_s2d` — the caller
    hands over a blockwise-assembled S2D input (FlowNet2 fusion
    assembly), and conv0's weights are transformed per block."""
    io_dtype, precision = _conv_io_dtypes(compute_dtype, True)
    if x_is_s2d:
        x2 = x.astype(io_dtype)
        if in_splits is None:
            in_splits = (p0["weights"].shape[2],)
        parts, off = [], 0
        for s in in_splits:
            parts.append(_s2d_w3s1(p0["weights"][:, :, off : off + s]))
            off += s
        w0 = jnp.concatenate(parts, axis=2)
    else:
        x2 = space_to_depth(x.astype(io_dtype))
        w0 = _s2d_w3s1(p0["weights"])
    y0 = lax.conv_general_dilated(
        x2,
        w0.astype(io_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DN,
        precision=precision,
    )
    y0 = leaky_relu(y0 + jnp.tile(p0["biases"], 4).astype(io_dtype))
    y = lax.conv_general_dilated(
        y0,
        _s2d_w3s2(p1["weights"]).astype(io_dtype),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=_DN,
        precision=precision,
    )
    y = leaky_relu(y + p1["biases"].astype(io_dtype))
    if return_intermediate:
        return y, y0
    return y


# ---------------------------------------------------------------------------
# Loss primitives
# ---------------------------------------------------------------------------

def average_endpoint_error(labels, predictions):
    """sqrt(sum_c (pred - gt)^2) summed over pixels, averaged over batch.

    Parity: reference ``src/utils.py::average_endpoint_error`` (the THE
    loss primitive): squared difference summed over the channel axis,
    sqrt, then ``reduce_sum / batch``.
    """
    labels = labels.astype(jnp.float32)
    predictions = predictions.astype(jnp.float32)
    sq = jnp.sum(jnp.square(predictions - labels), axis=3)
    epe = jnp.sqrt(sq + 1e-12)  # eps guards d/dx sqrt at exact zero
    batch = labels.shape[0]
    return jnp.sum(epe) / batch


def endpoint_error_mean(labels, predictions):
    """Per-pixel mean EPE (metric, not loss): matches flowlib.flow_error."""
    sq = jnp.sum(
        jnp.square(predictions.astype(jnp.float32) - labels.astype(jnp.float32)),
        axis=-1,
    )
    return jnp.mean(jnp.sqrt(sq + 1e-12))
