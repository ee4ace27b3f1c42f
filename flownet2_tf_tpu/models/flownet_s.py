"""FlowNetS — the 'simple' encoder/decoder flow network.

Architecture parity: reference ``src/flownet_s/flownet_s.py`` model():
6-channel concat input; encoder conv1 7x7/2x64 ... conv6_1 3x3x1024 with
LeakyReLU(0.1) and Caffe padding; decoder with 4x4/2 deconvs, per-level
``predict_flowN`` heads and learned ``upsample_flowNtoM`` flow deconvs;
final ``flow = predict_flow2 * 20`` bilinearly resized (TF1
align_corners=False) to input resolution. Loss(): multi-scale average EPE
on ``flow_gt * 0.05`` downsampled per level, weights 0.32/0.08/0.02/0.01/
0.005 for flow6..flow2, plus L2 weight decay handled by the trainer.

TPU-first notes: pure functional pytree params; convs run on the MXU in
the caller's compute dtype (bf16 policy) with f32 accumulation; everything
here is shape-static and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.models import common
from flownet2_tf_tpu.models.base import multiscale_loss
from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1

NAME = "FlowNetS"

# (name, kernel, stride, out_channels)
ENCODER = [
    ("conv1", 7, 2, 64),
    ("conv2", 5, 2, 128),
    ("conv3", 5, 2, 256),
    ("conv3_1", 3, 1, 256),
    ("conv4", 3, 2, 512),
    ("conv4_1", 3, 1, 512),
    ("conv5", 3, 2, 512),
    ("conv5_1", 3, 1, 512),
    ("conv6", 3, 2, 1024),
    ("conv6_1", 3, 1, 1024),
]

# decoder: level -> (deconv out-channels, concat skip source)
DECONV_CH = {5: 512, 4: 256, 3: 128, 2: 64}
SKIP = {5: "conv5_1", 4: "conv4_1", 3: "conv3_1", 2: "conv2"}


def init(key, input_channels: int = 6, dtype=jnp.float32):
    """Initialize a FlowNetS parameter pytree.

    ``input_channels`` is 6 for a raw image pair, 12 when stacked behind a
    warped-input stage (FlowNetCS/CSS second stages).
    """
    params = {}
    keys = iter(jax.random.split(key, 64))
    cin = input_channels
    for name, k, _, cout in ENCODER:
        params[name] = common.conv_params(next(keys), k, cin, cout, dtype)
        cin = cout

    enc_ch = dict((n, c) for n, _, _, c in ENCODER)
    prev_ch = 1024  # conv6_1
    for lvl in (6, 5, 4, 3, 2):
        params[f"predict_flow{lvl}"] = common.conv_params(
            next(keys), 3, prev_ch, 2, dtype
        )
        if lvl == 2:
            break
        params[f"deconv{lvl - 1}"] = common.deconv_params(
            next(keys), prev_ch, DECONV_CH[lvl - 1], dtype=dtype
        )
        params[f"upsample_flow{lvl}to{lvl - 1}"] = common.deconv_params(
            next(keys), 2, 2, dtype=dtype
        )
        skip_ch = enc_ch[SKIP[lvl - 1]]
        prev_ch = skip_ch + DECONV_CH[lvl - 1] + 2
    return params


def apply(params, inputs, training: bool = False, compute_dtype=None,
          x_s2d: bool = False, in_splits=None):
    """Forward pass. ``inputs``: dict with 'input_a'/'input_b' (NHWC,
    [0,1] floats) or a pre-concatenated NHWC tensor. With ``x_s2d`` the
    tensor is instead a blockwise S2D-encoded input at half resolution
    (models/stacks.py stage-2 assembly) with original channel counts
    ``in_splits``; conv1 consumes it directly via the transformed
    4x4/1 head and no full-res input ever materializes.

    Returns {'predict_flow6'..'predict_flow2', 'flow'} like the reference.
    """
    if isinstance(inputs, dict):
        x = jnp.concatenate([inputs["input_a"], inputs["input_b"]], axis=-1)
    else:
        x = inputs
    if x_s2d:
        n, half_h, half_w, _ = x.shape
        in_h, in_w = 2 * half_h, 2 * half_w
    else:
        n, in_h, in_w, _ = x.shape
    common.check_divisible_by_64(in_h, in_w)

    cd = compute_dtype
    acts = {}
    # named_scope per layer: trace-time metadata only (no runtime op);
    # the profiler's tf_op stat carries the scope path, so the op
    # ledger can attribute device time per LAYER, not just per source
    # line (benchmarks/op_ledger.py by_scope)
    for name, _, stride, _ in ENCODER:
        with jax.named_scope(name):
            if name == "conv1" and x_s2d:
                x = common.conv7x7s2_s2d(params[name], x, compute_dtype=cd,
                                         in_splits=in_splits,
                                         x_is_s2d=True)
            elif name == "conv1" and common.use_s2d_head7(x.shape[-1]):
                # space-to-depth head: exactly equivalent 4x4/1 conv on
                # the 2x2-folded input. Only taken for wide (stage-2)
                # inputs — the fold costs ~1 ms at full res (common.py
                # S2D flags).
                x = common.conv7x7s2_s2d(params[name], x, compute_dtype=cd)
            else:
                x = common.conv(params[name], x, stride=stride,
                                compute_dtype=cd)
        acts[name] = x

    return decoder(params, acts, (in_h, in_w), compute_dtype=cd)


def decoder(params, acts, input_hw, compute_dtype=None, top="conv6_1"):
    """Shared FlowNet refinement decoder (also used by FlowNetC).

    Per level L in 5..2: deconv(L), learned upsample of the previous flow,
    concat with the encoder skip, predict. Shapes halve exactly at every
    encoder stage (Caffe padding), so deconv outputs align with skips
    without cropping when H, W are multiples of 64 — the reference's
    divisibility requirement (SURVEY.md §5 long-context row).
    """
    cd = compute_dtype
    preds = {}
    x = acts[top]
    with jax.named_scope("predict_flow6"):
        flow = common.predict_flow(params["predict_flow6"], x,
                                   compute_dtype=cd)
    preds["predict_flow6"] = flow
    for lvl in (5, 4, 3, 2):
        with jax.named_scope(f"refine{lvl}"):
            up_feat = common.deconv(params[f"deconv{lvl}"], x,
                                    compute_dtype=cd)
            up_flow = common.deconv(
                params[f"upsample_flow{lvl + 1}to{lvl}"],
                flow,
                act=False,
                compute_dtype=cd,
            )
            skip = acts[SKIP[lvl]]
            # flow stays f32 in preds; cast only the concat copy so a
            # mixed concat doesn't promote the whole feature map back
            # to f32
            x = jnp.concatenate(
                [skip, up_feat, up_flow.astype(skip.dtype)], axis=-1
            )
            flow = common.predict_flow(
                params[f"predict_flow{lvl}"], x, compute_dtype=cd
            )
        preds[f"predict_flow{lvl}"] = flow

    with jax.named_scope("upsample_out"):
        full = resize_bilinear_tf1(flow * 20.0, input_hw[0], input_hw[1])
    preds["flow"] = full
    return preds


def loss(flow_gt, predictions):
    """Multi-scale average-EPE loss (reference flownet_s loss())."""
    return multiscale_loss(flow_gt, predictions)
