"""One-shot TF1 checkpoint -> native parameter-tree converter.

The reference ships slim checkpoints (``./checkpoints/FlowNet{S,C,CS,CSS,
SD,2}/flownet-X.ckpt-0``, reference ``src/flownet_*/test.py`` default
paths) with variables scoped like
``FlowNet2/FlowNetCSS/FlowNetCS/FlowNetC/conv1/weights``. Because this
framework's pytrees use exactly those scope names (models/*), conversion
is a mechanical re-layout:

* conv kernels: TF1 slim stores HWIO — copied as-is.
* deconv (conv2d_transpose) kernels: TF1 stores [H, W, out, in] and
  applies the spatially-mirrored kernel; our deconv is a forward
  input-dilated conv, so the kernel is mirrored and transposed to
  [H, W, in, out] (equivalence locked by
  tests/test_models.py::test_deconv_matches_tf1_conv2d_transpose).
* Adam slot variables / global_step / train-only bookkeeping: dropped.

Coverage is verified against the target model's init tree: every expected
leaf must be filled, shapes asserted (SURVEY.md §4 checkpoint-conversion
test strategy).

Requires TensorFlow (installed in this environment) only at conversion
time; the output .npz is consumed without TF.
"""

from __future__ import annotations

import re

import numpy as np

from flownet2_tf_tpu.training.warmstart import flatten, unflatten

# leaf layer-name prefixes that hold transposed-conv kernels
_DECONV_RE = re.compile(
    r"(^|/)(deconv\d|upsample_flow\d+to\d+|fuse_deconv\d|"
    r"fuse_upsample_flow\d+to\d+)$"
)

_SKIP_RE = re.compile(
    r"(Adam|Momentum|beta1_power|beta2_power|global_step|ExponentialMoving)"
)

_TOP_SCOPES = (
    "FlowNet2", "FlowNetCSS", "FlowNetCS", "FlowNetC", "FlowNetS",
    "FlowNetSD",
)


def _strip_top_scope(name: str) -> str:
    parts = name.split("/")
    if parts and parts[0] in _TOP_SCOPES:
        parts = parts[1:]
    return "/".join(parts)


def convert_variables(tf_vars: dict) -> dict:
    """{tf_variable_name: np.ndarray} -> flattened native param dict."""
    out = {}
    for name, value in tf_vars.items():
        if _SKIP_RE.search(name):
            continue
        path = _strip_top_scope(name)
        if not path.endswith("/weights") and not path.endswith("/biases"):
            continue
        layer = path.rsplit("/", 1)[0]
        value = np.asarray(value)
        if path.endswith("/weights") and _DECONV_RE.search(layer):
            if value.ndim != 4:
                raise ValueError(f"{name}: deconv kernel must be 4D")
            # [H, W, out, in] mirrored -> [H, W, in, out]
            value = value[::-1, ::-1].transpose(0, 1, 3, 2).copy()
        out[path] = value
    return out


def read_tf_checkpoint(path: str) -> dict:
    import tensorflow as tf  # local import: conversion-time only

    reader = tf.train.load_checkpoint(path)
    shapes = reader.get_variable_to_shape_map()
    return {name: reader.get_tensor(name) for name in shapes}


def convert(tf_checkpoint_path: str, model_name: str, out_path: str) -> int:
    """Convert and validate against ``model_name``'s parameter tree.

    Returns the number of converted leaves; writes a .npz usable by
    training.warmstart / training.infer.load_params.
    """
    import jax

    from flownet2_tf_tpu.models.registry import get_model

    tf_vars = read_tf_checkpoint(tf_checkpoint_path)
    flat = convert_variables(tf_vars)

    expected = flatten(
        jax.device_get(get_model(model_name).init(jax.random.PRNGKey(0)))
    )
    missing = sorted(set(expected) - set(flat))
    extra = sorted(set(flat) - set(expected))
    if missing:
        raise ValueError(
            f"conversion incomplete: {len(missing)} missing leaves, e.g. "
            f"{missing[:5]}"
        )
    for k, v in expected.items():
        if tuple(flat[k].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch at {k}: ckpt {flat[k].shape} vs model "
                f"{v.shape}"
            )
    if extra:
        # tolerated (e.g. train-only extras) but reported
        print(f"note: {len(extra)} unmatched ckpt leaves dropped: "
              f"{extra[:5]}")
        flat = {k: flat[k] for k in expected}
    np.savez(out_path, **flat)
    return len(flat)


def convert_tree(tf_checkpoint_path: str) -> dict:
    """Convert without model validation -> nested parameter tree."""
    return unflatten(convert_variables(read_tf_checkpoint(
        tf_checkpoint_path
    )))
