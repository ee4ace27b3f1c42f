"""Optimizer assembly: Adam + piecewise-constant LR + L2 weight decay +
stage freezing.

Parity targets (reference ``src/net.py`` train()):
* ``tf.train.AdamOptimizer(lr, momentum, momentum2)`` — optax.adam with
  b1=momentum, b2=momentum2.
* ``tf.train.piecewise_constant(global_step, step_values, learning_rates)``
  — utils.schedules.make_lr_schedule.
* slim ``weights_regularizer=l2_regularizer(weight_decay)`` on conv and
  deconv kernels only (not biases), folded into the total loss as
  ``weight_decay * sum(0.5 * ||w||^2)`` (tf.nn.l2_loss convention).
* stacked-training freezing (``trainable=False`` threaded through
  sub-nets): frozen sub-scopes get their gradients zeroed; with Adam
  moments starting at zero this keeps the parameters bit-identical.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from flownet2_tf_tpu.utils.schedules import get_schedule, make_lr_schedule


def make_optimizer(schedule):
    if isinstance(schedule, str):
        schedule = get_schedule(schedule)
    lr = make_lr_schedule(schedule)
    opt = optax.adam(
        learning_rate=lr,
        b1=schedule.get("momentum", 0.9),
        b2=schedule.get("momentum2", 0.999),
    )
    return opt, lr


def l2_regularization(params, frozen: Sequence[str] = ()) -> jnp.ndarray:
    """weight_decay-ready L2 term over 'weights' leaves of trainable
    scopes (biases excluded, like slim's weights_regularizer)."""
    total = jnp.zeros((), jnp.float32)

    def visit(tree, path):
        nonlocal total
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "weights":
                    total = total + 0.5 * jnp.sum(
                        jnp.square(v.astype(jnp.float32))
                    )
                else:
                    visit(v, path + (k,))

    trainable = mask_frozen(params, frozen, keep_trainable=True)
    visit(trainable, ())
    return total


def mask_frozen(tree, frozen: Sequence[str], keep_trainable: bool = True):
    """Return a copy of ``tree`` with frozen top-level scopes pruned
    (keep_trainable) or kept exclusively (not keep_trainable)."""
    if not frozen:
        return tree if keep_trainable else {}
    return {
        k: v
        for k, v in tree.items()
        if (k not in frozen) == keep_trainable
    }


def zero_frozen_grads(grads, frozen: Sequence[str]):
    """Zero gradients of frozen top-level sub-scopes."""
    if not frozen:
        return grads
    out = dict(grads)
    for name in frozen:
        if name in out:
            out[name] = jax.tree_util.tree_map(jnp.zeros_like, out[name])
    return out
