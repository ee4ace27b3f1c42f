"""Inference runtime: single-pair and dataset evaluation.

Counterpart of the reference's ``Net.test`` (reference ``src/net.py``
test(): imread pair, scale to [0,1], run graph, write flow PNG/.flo) plus
the fork's dataset-list evaluation surface. Handles arbitrary input sizes
by edge-padding up to the next multiple of 64 and cropping the flow back
(SURVEY.md §7 hard part 5 — the reference implicitly required %64 inputs).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from flownet2_tf_tpu.models.registry import get_model
from flownet2_tf_tpu.ops import dispatch
from flownet2_tf_tpu.training.warmstart import load_params_tree
from flownet2_tf_tpu.utils import flowlib
from flownet2_tf_tpu.utils.image_io import load_image_pair


def load_params(path):
    """Load params from an orbax run dir / converter .npz."""
    return load_params_tree(path)


def pad_to_multiple(x, multiple=64):
    """Edge-pad NHWC bottom/right to the next multiple; returns (x, h, w)."""
    n, h, w, c = x.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return x, h, w
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, h, w


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _forward(model_name, params, inputs, compute_dtype_name,
             dispatch_sig=None):
    # dispatch_sig: ops.dispatch.trace_signature() — part of the cache
    # key because the model trace bakes in the thread-local dispatch
    # knobs (half-res warps, kernel impl, ...); without it a call under
    # a new dispatch context would silently reuse the old trace
    model = get_model(model_name)
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else None
    a, h, w = pad_to_multiple(inputs["input_a"])
    b, _, _ = pad_to_multiple(inputs["input_b"])
    preds = model.apply(
        params, {"input_a": a, "input_b": b}, compute_dtype=cd
    )
    return preds["flow"][:, :h, :w, :]


def infer_flow(model_name, params, image_a, image_b,
               compute_dtype="float32"):
    """Run a model on a single pair or batch; returns full-res flow.

    ``image_a/b``: (H, W, 3) or (N, H, W, 3) float arrays in [0, 1].
    """
    a = jnp.asarray(image_a, jnp.float32)
    b = jnp.asarray(image_b, jnp.float32)
    squeeze = a.ndim == 3
    if squeeze:
        a, b = a[None], b[None]
    flow = _forward(
        model_name, params, {"input_a": a, "input_b": b},
        str(compute_dtype), dispatch.trace_signature(),
    )
    flow = np.asarray(flow)
    return flow[0] if squeeze else flow


def test_pair(model_name, checkpoint, input_a_path, input_b_path, out_dir,
              save_image=True, save_flo=True, compute_dtype="float32",
              spatial_tiles=0, spatial_overlap=128):
    """The reference CLI flow: pair of image files -> .png / .flo outputs.

    ``spatial_tiles`` > 1 runs halo-banded spatially-parallel inference
    (parallel/spatial.py): bands are sharded one-per-device across the
    mesh; inputs are %64-padded here and the flow cropped back.
    Returns the predicted (H, W, 2) flow.
    """
    params = load_params(checkpoint)
    if str(compute_dtype) == "bfloat16":
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params)
    a, b = load_image_pair(input_a_path, input_b_path)
    if spatial_tiles and spatial_tiles > 1:
        from flownet2_tf_tpu.parallel.spatial import infer_flow_spatial

        # %64-pad on the HOST: a device round-trip here would pay the
        # tunnel's pathological bulk device->host fetch for nothing
        h, w = a.shape[:2]
        ph, pw = (-h) % 64, (-w) % 64
        ap = np.pad(np.asarray(a, np.float32), ((0, ph), (0, pw), (0, 0)),
                    mode="edge")
        bp = np.pad(np.asarray(b, np.float32), ((0, ph), (0, pw), (0, 0)),
                    mode="edge")
        flow = infer_flow_spatial(
            model_name, params, ap, bp,
            n_tiles=int(spatial_tiles), overlap=int(spatial_overlap),
            compute_dtype=compute_dtype,
        )[:h, :w]
    else:
        flow = infer_flow(model_name, params, a, b,
                          compute_dtype=compute_dtype)
    write_flow_outputs(flow, out_dir, input_a_path,
                       save_flo=save_flo, save_image=save_image)
    return flow


def write_flow_outputs(flow, out_dir, input_a_path, save_flo=True,
                       save_image=True):
    """Reference output convention: <out>/<stem(input_a)>_flow.{flo,png}.

    Shared by the `test` and `serve` CLI paths; returns the stem."""
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.join(
        os.fspath(out_dir),
        os.path.splitext(os.path.basename(os.fspath(input_a_path)))[0]
        + "_flow",
    )
    if save_flo:
        flowlib.write_flow(flow, stem + ".flo")
    if save_image:
        flowlib.write_flow_png(flow, stem + ".png")
    return stem


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _aee_on_device(model_name, params, batch, compute_dtype_name,
                   dispatch_sig=None):
    """Forward + masked AEE fully on device; only a scalar pair leaves.

    Critical under the axon tunnel (bulk device->host fetches are
    ~1000x slower than a scalar) and generally the TPU-appropriate eval
    shape: no flow field ever crosses to the host. Inputs arrive already
    padded to a %64 bucket with a validity mask covering the original
    region, so KITTI-style per-sequence size jitter maps onto a handful
    of compiled shapes instead of one compile per exact H x W. (Tests
    pin the bucketing via this jit's ``_cache_size()`` — one compile per
    bucket, not per distinct input size.)
    """
    model = get_model(model_name)
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else None
    preds = model.apply(
        params,
        {"input_a": batch["input_a"], "input_b": batch["input_b"]},
        compute_dtype=cd,
    )
    epe = jnp.sqrt(
        jnp.sum(jnp.square(preds["flow"] - batch["flow"]), axis=-1) + 1e-12
    )
    valid = batch["valid"]
    # per-sample sums: the dataset metric is the mean of per-PAIR AEEs
    # (reference convention), so samples must stay separable even when
    # bucket-batched; a zero-valid padding sample contributes count 0.
    return (jnp.sum(epe * valid, axis=(1, 2)),
            jnp.sum(valid, axis=(1, 2)))


def _bucket_batch(item, multiple=64):
    """Pad one {image_a, image_b, flow} item to the next %``multiple``
    bucket: images edge-padded, GT zero-padded, validity mask 0 in the
    padding (and ANDed with the KITTI mask when present)."""
    a = np.asarray(item["image_a"], np.float32)
    b = np.asarray(item["image_b"], np.float32)
    gt = np.asarray(item["flow"], np.float32)
    h, w = a.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if gt.shape[-1] == 3:  # KITTI: [u, v, valid]
        valid = gt[..., 2]
        gt = gt[..., :2]
    else:
        valid = np.ones((h, w), np.float32)
    if ph or pw:
        pad_img = ((0, ph), (0, pw), (0, 0))
        a = np.pad(a, pad_img, mode="edge")
        b = np.pad(b, pad_img, mode="edge")
        gt = np.pad(gt, pad_img)
        valid = np.pad(valid, ((0, ph), (0, pw)))
    return {
        "input_a": jnp.asarray(a)[None],
        "input_b": jnp.asarray(b)[None],
        "flow": jnp.asarray(gt)[None],
        "valid": jnp.asarray(valid)[None],
    }


def evaluate_dataset(model_name, params, dataset, compute_dtype="float32",
                     limit=None, verbose=False, batch_size=1):
    """Average endpoint error over a dataset of {image_a, image_b, flow}.

    Honors KITTI validity masks ((H, W, 3) ground truth). This is the
    fork's dataset-list evaluation surface (SURVEY.md §2.1 test mains
    [fork-delta]). The AEE reduction runs on device; only per-pair
    scalars are fetched, and inputs are padded to %64 shape buckets so
    mixed-size datasets compile O(buckets) times.

    ``batch_size`` > 1 batches pairs WITHIN a bucket (batching pays on
    TPU: serving sweep +11% at b8); the metric is unchanged — per-pair
    AEEs averaged; tail batches run at their true (smaller) size.
    """
    n = len(dataset) if limit is None else min(limit, len(dataset))
    if str(compute_dtype) == "bfloat16":
        # serving-mode pre-cast, ONCE before the eval loop: bitwise-
        # identical bf16 forward, no per-call weight converts/uploads
        # (common.cast_params_for_inference)
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params)
    batch_size = max(1, int(batch_size))
    aee_sum = 0.0
    seen = 0

    def flush(items):
        nonlocal aee_sum, seen
        k = len(items)
        # tail batches run at their TRUE size — one extra compile per
        # bucket at most (vs padding to batch_size, which costs up to
        # batch_size-1 redundant forwards per bucket on sparse buckets,
        # the exact KITTI size-jitter case bucketing exists for)
        batch = {
            key: jnp.concatenate([it[key] for it in items], axis=0)
            for key in items[0]
        }
        totals, counts = _aee_on_device(
            model_name, params, batch, str(compute_dtype),
            dispatch.trace_signature(),
        )
        totals = np.asarray(totals)[:k]
        counts = np.asarray(counts)[:k]
        for t, c in zip(totals, counts):
            seen += 1
            aee = float(t) / max(float(c), 1.0)
            aee_sum += aee
            if verbose:
                print(f"  [{seen}/{n}] AEE {aee:.4f}")

    pending = {}  # bucket shape -> list of single-pair padded batches
    for i in range(n):
        item = _bucket_batch(dataset[i])
        key = item["input_a"].shape[1:3]
        pending.setdefault(key, []).append(item)
        if len(pending[key]) == batch_size:
            flush(pending.pop(key))
    for items in pending.values():
        flush(items)
    return aee_sum / max(n, 1)
