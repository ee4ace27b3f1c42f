"""FlowNetC — siamese towers + correlation cost volume.

Architecture parity: reference ``src/flownet_c/flownet_c.py`` model():
conv1/conv2/conv3 applied to input_a and input_b with SHARED weights
(slim reuse=True on the second tower); 441-channel cost volume
``correlation(conv3_a, conv3_b, kernel_size=1, max_displacement=20,
stride_1=1, stride_2=2, pad=20)`` followed by LeakyReLU; a 1x1x32
``conv_redir`` on conv3_a; concat -> conv3_1 and the same encoder tail +
decoder as FlowNetS (skip at level 2 is tower-A conv2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.models import common, flownet_s
from flownet2_tf_tpu.models.base import multiscale_loss
from flownet2_tf_tpu.ops.correlation import correlation

NAME = "FlowNetC"

TOWER = [
    ("conv1", 7, 2, 64),
    ("conv2", 5, 2, 128),
    ("conv3", 5, 2, 256),
]

TAIL = [
    ("conv3_1", 3, 1, 256),
    ("conv4", 3, 2, 512),
    ("conv4_1", 3, 1, 512),
    ("conv5", 3, 2, 512),
    ("conv5_1", 3, 1, 512),
    ("conv6", 3, 2, 1024),
    ("conv6_1", 3, 1, 1024),
]

CORR_KWARGS = dict(
    kernel_size=1, max_displacement=20, stride_1=1, stride_2=2, pad=20
)
CORR_CHANNELS = 441
REDIR_CHANNELS = 32


def init(key, input_channels: int = 3, dtype=jnp.float32):
    params = {}
    keys = iter(jax.random.split(key, 64))
    cin = input_channels
    for name, k, _, cout in TOWER:
        params[name] = common.conv_params(next(keys), k, cin, cout, dtype)
        cin = cout
    params["conv_redir"] = common.conv_params(
        next(keys), 1, 256, REDIR_CHANNELS, dtype
    )
    cin = REDIR_CHANNELS + CORR_CHANNELS
    for name, k, _, cout in TAIL:
        params[name] = common.conv_params(next(keys), k, cin, cout, dtype)
        cin = cout

    # decoder — identical layout to FlowNetS
    enc_ch = {n: c for n, _, _, c in TOWER}
    enc_ch.update({n: c for n, _, _, c in TAIL})
    prev_ch = 1024
    for lvl in (6, 5, 4, 3, 2):
        params[f"predict_flow{lvl}"] = common.conv_params(
            next(keys), 3, prev_ch, 2, dtype
        )
        if lvl == 2:
            break
        down = lvl - 1
        params[f"deconv{down}"] = common.deconv_params(
            next(keys), prev_ch, flownet_s.DECONV_CH[down], dtype=dtype
        )
        params[f"upsample_flow{lvl}to{down}"] = common.deconv_params(
            next(keys), 2, 2, dtype=dtype
        )
        prev_ch = enc_ch[flownet_s.SKIP[down]] + flownet_s.DECONV_CH[down] + 2
    return params


def apply(params, inputs, training: bool = False, compute_dtype=None):
    a = inputs["input_a"]
    b = inputs["input_b"]
    n, in_h, in_w, _ = a.shape
    common.check_divisible_by_64(in_h, in_w)
    cd = compute_dtype

    acts = {}

    # shared-weight siamese towers: run both images through one batched
    # pass (doubles the conv batch — better MXU utilization at b=1 —
    # instead of two sequential tower evaluations)
    x = jnp.concatenate([a, b], axis=0)
    feats_a, feats_b = {}, {}
    # named_scope per layer: per-layer profiler attribution
    # (flownet_s.apply comment; op_ledger by_scope)
    for name, _, stride, _ in TOWER:
        with jax.named_scope(f"tower_{name}"):
            if name == "conv1" and common.use_s2d_head7(x.shape[-1]):
                # space-to-depth head (3-ch towers take the plain conv:
                # models/common.py S2D flags)
                x = common.conv7x7s2_s2d(params[name], x, compute_dtype=cd)
            else:
                x = common.conv(params[name], x, stride=stride,
                                compute_dtype=cd)
        feats_a[name], feats_b[name] = jnp.split(x, 2, axis=0)

    with jax.named_scope("correlation"):
        cc = correlation(feats_a["conv3"], feats_b["conv3"], **CORR_KWARGS)
        cc = common.leaky_relu(cc)
    with jax.named_scope("conv_redir"):
        redir = common.conv(params["conv_redir"], feats_a["conv3"],
                            compute_dtype=cd)
    x = jnp.concatenate([redir, cc.astype(redir.dtype)], axis=-1)

    for name, _, stride, _ in TAIL:
        with jax.named_scope(name):
            x = common.conv(params[name], x, stride=stride,
                            compute_dtype=cd)
        acts[name] = x

    # decoder skips: levels 5/4/3 from the tail, level 2 from tower A.
    acts["conv2"] = feats_a["conv2"]
    return flownet_s.decoder(params, acts, (in_h, in_w), compute_dtype=cd)


def loss(flow_gt, predictions):
    return multiscale_loss(flow_gt, predictions)
