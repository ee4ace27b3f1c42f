"""FlowNetSD — the small-displacement network (all-3x3 encoder,
interconv refinement).

Architecture parity: reference ``src/flownet_sd/flownet_sd.py`` model():
encoder conv0 3x3x64 .. conv6_1 3x3x1024 (strides 2 at conv1, conv2,
conv3, conv4, conv5, conv6); decoder identical in shape to FlowNetS but
with an extra unactivated 3x3 ``interconv{5..2}`` before each
``predict_flow{5..2}`` head; final flow scaled by 20 and resized to input
resolution (scale convention flagged '(re-verify)' in SURVEY.md §2.1 —
kept symmetric with S/C so the FlowNet2 fusion's *0.05 rescale is
consistent across branches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.models import common
from flownet2_tf_tpu.models.base import multiscale_loss
from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1

NAME = "FlowNetSD"

ENCODER = [
    ("conv0", 3, 1, 64),
    ("conv1", 3, 2, 64),
    ("conv1_1", 3, 1, 128),
    ("conv2", 3, 2, 128),
    ("conv2_1", 3, 1, 128),
    ("conv3", 3, 2, 256),
    ("conv3_1", 3, 1, 256),
    ("conv4", 3, 2, 512),
    ("conv4_1", 3, 1, 512),
    ("conv5", 3, 2, 512),
    ("conv5_1", 3, 1, 512),
    ("conv6", 3, 2, 1024),
    ("conv6_1", 3, 1, 1024),
]

DECONV_CH = {5: 512, 4: 256, 3: 128, 2: 64}
INTERCONV_CH = {5: 512, 4: 256, 3: 128, 2: 64}
SKIP = {5: "conv5_1", 4: "conv4_1", 3: "conv3_1", 2: "conv2_1"}


def init(key, input_channels: int = 6, dtype=jnp.float32):
    params = {}
    keys = iter(jax.random.split(key, 64))
    cin = input_channels
    for name, k, _, cout in ENCODER:
        params[name] = common.conv_params(next(keys), k, cin, cout, dtype)
        cin = cout

    enc_ch = {n: c for n, _, _, c in ENCODER}
    params["predict_flow6"] = common.conv_params(next(keys), 3, 1024, 2, dtype)
    prev_ch = 1024
    for lvl in (5, 4, 3, 2):
        params[f"deconv{lvl}"] = common.deconv_params(
            next(keys), prev_ch, DECONV_CH[lvl], dtype=dtype
        )
        params[f"upsample_flow{lvl + 1}to{lvl}"] = common.deconv_params(
            next(keys), 2, 2, dtype=dtype
        )
        concat_ch = enc_ch[SKIP[lvl]] + DECONV_CH[lvl] + 2
        params[f"interconv{lvl}"] = common.conv_params(
            next(keys), 3, concat_ch, INTERCONV_CH[lvl], dtype
        )
        params[f"predict_flow{lvl}"] = common.conv_params(
            next(keys), 3, INTERCONV_CH[lvl], 2, dtype
        )
        prev_ch = concat_ch
    return params


def apply(params, inputs, training: bool = False, compute_dtype=None):
    if isinstance(inputs, dict):
        x = jnp.concatenate([inputs["input_a"], inputs["input_b"]], axis=-1)
    else:
        x = inputs
    n, in_h, in_w, _ = x.shape
    common.check_divisible_by_64(in_h, in_w)
    cd = compute_dtype

    acts = {}
    encoder = ENCODER
    # named_scope per layer: per-layer profiler attribution
    # (flownet_s.apply comment; op_ledger by_scope)
    if common.s2d_heads():
        # conv0 (full-res 3x3/1) + conv1 (3x3/2) run as one
        # space-to-depth pair — no full-res 64-channel activation is
        # materialized (neither is a decoder skip; SKIP starts at
        # conv1_1). Exactly equivalent: models/common.py S2D section.
        with jax.named_scope("conv0_conv1_s2d"):
            x = common.conv_pair3x3_s2d(
                params["conv0"], params["conv1"], x, compute_dtype=cd
            )
        encoder = ENCODER[2:]
    for name, _, stride, _ in encoder:
        with jax.named_scope(name):
            x = common.conv(params[name], x, stride=stride,
                            compute_dtype=cd)
        acts[name] = x

    preds = {}
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
            x = jnp.concatenate(
                [skip, up_feat, up_flow.astype(skip.dtype)], axis=-1
            )
            inter = common.conv(
                params[f"interconv{lvl}"], x, act=False, compute_dtype=cd,
                interconv=True,
            )
            flow = common.predict_flow(
                params[f"predict_flow{lvl}"], inter, compute_dtype=cd
            )
        preds[f"predict_flow{lvl}"] = flow

    with jax.named_scope("upsample_out"):
        preds["flow"] = resize_bilinear_tf1(flow * 20.0, in_h, in_w)
    return preds


def loss(flow_gt, predictions):
    return multiscale_loss(flow_gt, predictions)
