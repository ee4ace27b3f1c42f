"""Stage warm-starting: load a prior stage's parameters into a sub-scope
of a stacked model.

Parity: the reference's ``checkpoints`` dict in ``Net.train`` (reference
``src/net.py`` train(), ``src/flownet_cs/train.py``):
``{'checkpoints/FlowNetC/flownet-C.ckpt-0': ('FlowNetC',
'FlowNetCS/FlowNetC')}`` — slim renames variables from the source scope
into the graph scope and assigns at session start. Here scopes are pytree
paths, so warm starting is a pure dict splice.

Sources can be:
* an orbax checkpoint directory written by Trainer (the ``params``
  sub-tree is used),
* a .npz file of flattened '/'-joined parameter paths
  (tools/convert_tf1_checkpoint.py output).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def load_params_tree(path):
    """Load a parameter pytree from an orbax run dir or converter .npz."""
    path = os.fspath(path)
    if path.endswith(".npz"):
        return unflatten(dict(np.load(path)))
    # orbax: either a CheckpointManager root (with step subdirs) or a
    # single step dir
    import orbax.checkpoint as ocp

    if os.path.isdir(os.path.join(path, "checkpoints")):
        path = os.path.join(path, "checkpoints")
    entries = [e for e in os.listdir(path) if e.isdigit()]
    if entries:
        path = os.path.join(path, str(max(int(e) for e in entries)))
    # CheckpointManager saves items under a 'default' subdirectory
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    # Restore as host numpy regardless of the topology the checkpoint
    # was saved under (an 8-chip training run must warm-start a 1-chip
    # run and vice versa; default restore insists on matching devices).
    import jax

    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.abspath(path))
        tree = meta.item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        restored = ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.PyTreeRestore(restore_args=restore_args),
        )
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    return restored


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def get_scope(tree, scope: str):
    """'' -> whole tree; 'A/B' -> tree['A']['B']."""
    if not scope:
        return tree
    node = tree
    for part in scope.split("/"):
        node = node[part]
    return node


def set_scope(tree, scope: str, value):
    if not scope:
        return value
    parts = scope.split("/")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value
    return tree


def _check_compatible(dst, src, scope):
    dst_flat = flatten(dst)
    src_flat = flatten(src)
    missing = sorted(set(dst_flat) - set(src_flat))
    extra = sorted(set(src_flat) - set(dst_flat))
    if missing or extra:
        raise ValueError(
            f"warm-start scope {scope!r} mismatch: missing {missing[:5]} "
            f"extra {extra[:5]} (of {len(missing)}/{len(extra)})"
        )
    for k in dst_flat:
        if tuple(dst_flat[k].shape) != tuple(src_flat[k].shape):
            raise ValueError(
                f"warm-start shape mismatch at {scope}/{k}: "
                f"{src_flat[k].shape} vs expected {dst_flat[k].shape}"
            )


def apply_warm_starts(params, checkpoints):
    """Splice prior-stage checkpoints into a parameter tree.

    ``checkpoints``: the reference-style dict {path: (src_scope,
    dst_scope)}, or an iterable of (path, src_scope, dst_scope) tuples —
    the tuple form allows splicing SEVERAL sub-scopes out of one
    checkpoint, which a path-keyed dict cannot express. Shapes and key
    sets are verified (the converter test strategy in SURVEY.md §4:
    100% variable coverage, shapes asserted).
    """
    import copy

    import jax

    if isinstance(checkpoints, dict):
        entries = [(p, s, d) for p, (s, d) in checkpoints.items()]
    else:
        entries = [tuple(e) for e in checkpoints]
    params = copy.deepcopy(jax.device_get(params))
    for path, src_scope, dst_scope in entries:
        source_tree = load_params_tree(path)
        sub = get_scope(source_tree, src_scope)
        dst = get_scope(params, dst_scope)
        _check_compatible(dst, sub, dst_scope)
        params = set_scope(params, dst_scope, sub)
    return params
