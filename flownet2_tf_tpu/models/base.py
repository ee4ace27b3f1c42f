"""Model-zoo shared pieces: the multi-scale EPE loss template and the
Model wrapper the registry hands out.

Loss parity (reference ``src/flownet_s/flownet_s.py`` loss(), shared
shape across S/C/SD): ``flow_gt * 0.05`` (the divide-by-20 convention) is
area-downsampled to each prediction level; the per-level average endpoint
errors are combined with weights 0.32, 0.08, 0.02, 0.01, 0.005 for
predict_flow6..predict_flow2 (the original Caffe loss_weights). L2 weight
decay is added by the trainer (slim added it via weights_regularizer into
tf.losses.get_total_loss()).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

from flownet2_tf_tpu.models.common import average_endpoint_error
from flownet2_tf_tpu.ops.downsample import downsample

LOSS_WEIGHTS = {
    "predict_flow6": 0.32,
    "predict_flow5": 0.08,
    "predict_flow4": 0.02,
    "predict_flow3": 0.01,
    "predict_flow2": 0.005,
}

FLOW_SCALE = 0.05  # = 1/20: network-internal flow units


def multiscale_loss(flow_gt, predictions, weights=None):
    """Weighted multi-scale average EPE against downsampled scaled GT."""
    weights = weights or LOSS_WEIGHTS
    gt = flow_gt * FLOW_SCALE
    total = jnp.zeros((), jnp.float32)
    for name, w in weights.items():
        if name not in predictions:
            continue
        pred = predictions[name]
        gt_lvl = downsample(gt, (pred.shape[1], pred.shape[2]))
        total = total + w * average_endpoint_error(gt_lvl, pred)
    return total


@dataclasses.dataclass(frozen=True)
class Model:
    """A flow model: init/apply/loss triple plus metadata.

    ``apply(params, inputs, training=False, compute_dtype=None)`` returns
    the reference's prediction dict ({'predict_flow6'.., 'flow'} — stacked
    models also expose intermediate branch flows).
    """

    name: str
    init: Callable[..., Any]
    apply: Callable[..., Any]
    loss: Callable[..., Any]
    # which parameter sub-scopes stay frozen during stacked training
    # (reference threads trainable=False through sub-nets)
    default_frozen: tuple = ()
