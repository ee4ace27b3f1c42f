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


def channel_norm(x):
    """Per-pixel L2 norm across channels, keepdims -> (..., 1).

    Used for brightness error / flow magnitude in the stacked nets
    (reference ``src/flownet_cs/flownet_cs.py``, ``src/flownet2/
    flownet2.py``).
    """
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


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


def _conv_io_dtypes(compute_dtype, act):
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
      which would eat the <=1e-2 EPE parity budget).
    """
    if compute_dtype is None or compute_dtype == jnp.float32 or not act:
        return jnp.float32, lax.Precision.HIGHEST if (
            compute_dtype is None or compute_dtype == jnp.float32
        ) else lax.Precision.DEFAULT
    return compute_dtype, lax.Precision.DEFAULT


def conv(p, x, stride: int = 1, act: bool = True,
         compute_dtype=None):
    """Caffe-padded conv + optional LeakyReLU (see _conv_io_dtypes)."""
    w = p["weights"]
    k = w.shape[0]
    pad = (k - 1) // 2
    io_dtype, precision = _conv_io_dtypes(compute_dtype, act)
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
    w = p["weights"]
    io_dtype, precision = _conv_io_dtypes(compute_dtype, act)
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
