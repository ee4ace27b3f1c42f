"""AOT serving export: compile a model forward once, ship one artifact.

The reference era's serving path was TF1 ``freeze_graph`` — a single
file holding graph + weights that a server loads without the model
code. The TPU-native equivalent is :mod:`jax.export`: the jitted
forward is lowered to StableHLO *ahead of time* and serialized together
with the weights into one ``.flowpak`` zip:

    exported.bin   jax.export artifact for fn(params, image_a, image_b)
    params.npz     flat weight arrays (warmstart.flatten naming; bf16
                   leaves stored as uint16 bit patterns)
    meta.json      model, shapes, dtype, warp mode, platforms,
                   data_parallel degree, bf16-leaf manifest

``load_serving`` restores the artifact WITHOUT touching the model
registry or any flownet2_tf_tpu model code — the compute graph is
frozen inside the StableHLO, so serving hosts need only jax + the
artifact. Serving-preset choices (bf16 params pre-cast, half-res stack
warps) are baked in at export time via the same dispatch knobs the
bench headline uses; they are trace-time decisions, so the exported
graph carries them implicitly.

Exports are shape-specialized (static shapes are what make the XLA
program fast — SURVEY §7 design stance); one artifact per serving
resolution, mirroring the %64 bucketing the eval path uses.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import warnings
import zipfile

import numpy as np

FORMAT_VERSION = 1


def _bf16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _serving_forward(model_name: str, compute_dtype: str):
    """Build fn(params, a, b) -> (N,H,W,2) flow for export."""
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model

    m = get_model(model_name)
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    def fn(params, image_a, image_b):
        out = m.apply(params, {"input_a": image_a, "input_b": image_b},
                      compute_dtype=cd)
        return out["flow"]

    return fn


def _serving_mesh(n):
    """(mesh, replicated, batch-sharded) over the first ``n`` devices.

    Used identically at export and at load so the recorded device
    assignment lines up (jax.export pins nr_devices, not device ids).
    """
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    return mesh, NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def _spatial_serving_forward(model_name, compute_dtype, n_tiles, overlap,
                             batched_sharding):
    """fn(params, a, b) with halo-banded H-tiling inside the graph:
    bands ride the batch axis, constrained to one-band-per-device
    (parallel/spatial.py construction, frozen into the artifact)."""
    import jax
    import jax.numpy as jnp

    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.parallel.spatial import extract_tiles, stitch_tiles

    m = get_model(model_name)
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    def fn(params, image_a, image_b):
        ta, core, offsets, h = extract_tiles(image_a, n_tiles, overlap)
        tb, _, _, _ = extract_tiles(image_b, n_tiles, overlap)
        ta = jax.lax.with_sharding_constraint(ta, batched_sharding)
        tb = jax.lax.with_sharding_constraint(tb, batched_sharding)
        preds = m.apply(params, {"input_a": ta, "input_b": tb},
                        compute_dtype=cd)
        return stitch_tiles(preds["flow"], core, offsets, h)

    return fn


def _export_one(model_name, params, height, width, batch, compute_dtype,
                warp_mode, platforms, dp, sp, spatial_overlap,
                fusion_res=1):
    """Lower + export one shape-specialized serving forward (the core
    of export_serving; shared with export_serving_bundle)."""
    import jax
    from jax import export as jexport

    from flownet2_tf_tpu.ops import dispatch

    if dp > 1 and sp > 1:
        raise ValueError("data_parallel and spatial_tiles are exclusive")
    n_devices = max(dp, sp)
    if n_devices > 1 and len(jax.devices()) < n_devices:
        raise ValueError(
            f"need {n_devices} devices visible at export; have "
            f"{len(jax.devices())}"
        )
    if sp > 1:
        if batch != 1:
            raise ValueError("spatial_tiles serving is single-pair "
                             f"(batch=1); got batch={batch}")
        _, repl, batched = _serving_mesh(sp)
        fn = _spatial_serving_forward(model_name, compute_dtype, sp,
                                      spatial_overlap, batched)
        jitted = jax.jit(fn, in_shardings=(repl, repl, repl),
                         out_shardings=repl)
    elif dp > 1:
        if batch % dp:
            raise ValueError(
                f"data_parallel={dp} needs batch % {dp} == 0: got {batch}"
            )
        fn = _serving_forward(model_name, compute_dtype)
        _, repl, batched = _serving_mesh(dp)
        jitted = jax.jit(fn, in_shardings=(repl, batched, batched),
                         out_shardings=batched)
    else:
        fn = _serving_forward(model_name, compute_dtype)
        jitted = jax.jit(fn)

    with contextlib.ExitStack() as stack:
        if warp_mode == "half":
            stack.enter_context(dispatch.use_half_res_warp(True))
        elif warp_mode == "quarter":
            stack.enter_context(dispatch.use_warp_res(4))
        elif warp_mode == "full":
            # Pin exact warps explicitly: without this an ambient
            # FLOWNET2_TPU_WARP_RES env var would silently bake coarse
            # warps into a durable artifact whose metadata says 'full'
            # (ADVICE r3). bench/profiler pin the same way.
            stack.enter_context(dispatch.use_warp_res(1))
        else:
            raise ValueError(
                f"warp_mode must be 'half', 'quarter' or 'full': "
                f"{warp_mode!r}")
        # Pin the fusion grid the same way: an ambient
        # FLOWNET2_TPU_FUSION_RES=2 must not silently bake the
        # half-res-fusion approximation into a durable artifact whose
        # metadata doesn't say so (same ADVICE r3 failure mode as
        # warp_res). fusion_res is an explicit export parameter,
        # recorded in the artifact metadata.
        stack.enter_context(dispatch.use_fusion_res(fusion_res))
        if platforms is not None and len(platforms) > 1 \
                and dispatch.get_implementation() == "auto":
            # 'auto' picks a correlation impl from the EXPORT host's
            # backend at trace time; a multi-platform artifact must bake
            # a platform-independent choice. mxu (einsum+skew) is the
            # measured in-model winner on TPU and runs everywhere.
            stack.enter_context(dispatch.use_implementation("mxu"))
        img = jax.ShapeDtypeStruct((batch, height, width, 3), np.float32)
        p_spec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params
        )
        kwargs = {}
        if platforms is not None:
            kwargs["platforms"] = tuple(platforms)
        return jexport.export(jitted, **kwargs)(p_spec, img, img)


def export_serving(model_name, params, height, width, out_path, batch=1,
                   compute_dtype="bfloat16", warp_mode="half",
                   platforms=None, data_parallel=0, spatial_tiles=0,
                   spatial_overlap=128, fusion_res=1):
    """Export one compiled serving forward to ``out_path`` (.flowpak).

    ``warp_mode='half'`` bakes the half-res stack-warp serving preset
    (docs/DESIGN.md: 1.55x for an AEE delta within +-0.011 px on
    trained weights — the sign is curriculum-dependent);
    ``'full'`` keeps exact warps (the parity path). ``platforms``
    defaults to the current backend; pass e.g. ``['tpu', 'cpu']`` for a
    multi-platform artifact.

    ``data_parallel=N`` (N > 1) exports the forward pjit-sharded over an
    N-chip ``('data',)`` mesh — params replicated, batch split over ICI
    — so a multi-chip serving host loads ONE artifact and feeds full
    batches; requires ``batch % N == 0`` and N visible devices both at
    export and at load.

    ``spatial_tiles=N`` (N > 1, batch must be 1, exclusive with
    data_parallel) instead freezes halo-banded spatial parallelism into
    the artifact: the frame is H-tiled inside the graph, one band per
    chip, band cores stitched back — big-frame multi-chip serving from
    one artifact (approximation decays with ``spatial_overlap``;
    docs/DESIGN.md seam table).
    """
    if height % 64 or width % 64:
        raise ValueError(
            f"serving export shapes must be multiples of 64 (six stride-2 "
            f"stages; SURVEY §7 hard part 5): got {height}x{width}. Pad "
            "to the next multiple and crop the flow on the host."
        )

    if compute_dtype == "bfloat16":
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params)

    dp = int(data_parallel) if data_parallel else 0
    sp = int(spatial_tiles) if spatial_tiles else 0
    exported = _export_one(
        model_name, params, height, width, batch, compute_dtype,
        warp_mode, platforms, dp, sp, spatial_overlap,
        fusion_res=int(fusion_res),
    )

    params_bytes, bf16_leaves = _encode_params(params)

    meta = {
        "format_version": FORMAT_VERSION,
        "model": model_name,
        "batch": batch,
        "height": height,
        "width": width,
        "compute_dtype": compute_dtype,
        "warp_mode": warp_mode,
        "platforms": list(exported.platforms),
        "data_parallel": dp,
        "spatial_tiles": sp,
        "spatial_overlap": int(spatial_overlap) if sp else 0,
        "fusion_res": int(fusion_res),
        "bf16_leaves": bf16_leaves,
    }
    out_path = os.fspath(out_path)
    # compresslevel=1: float weights are near-incompressible; higher
    # levels cost ~5s/150MB of export (and test) time for ~nothing
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED,
                         compresslevel=1) as z:
        z.writestr("exported.bin", exported.serialize())
        z.writestr("params.npz", params_bytes)
        z.writestr("meta.json", json.dumps(meta, indent=1))
    return meta


def _encode_params(params):
    """Flatten + npz-encode a param tree. numpy has no native bfloat16:
    savez would round-trip bf16 leaves as opaque void-2 ('|V2') that
    jax rejects — store them as uint16 bit patterns with a manifest;
    load_serving views them back. Returns (npz bytes, bf16 leaf names).
    """
    import jax

    from flownet2_tf_tpu.training import warmstart

    flat = warmstart.flatten(jax.tree.map(np.asarray, params))
    bf16_leaves = sorted(
        k for k, v in flat.items() if v.dtype == _bf16_dtype()
    )
    bf16_set = set(bf16_leaves)
    flat = {
        k: (v.view(np.uint16) if k in bf16_set else v)
        for k, v in flat.items()
    }
    buf = io.BytesIO()
    np.savez(buf, **flat)
    return buf.getvalue(), bf16_leaves


BUNDLE_FORMAT_VERSION = 2


def export_serving_bundle(model_name, params, shapes, out_path,
                          compute_dtype="bfloat16", warp_mode="half",
                          platforms=None):
    """Export SEVERAL shape-specialized forwards into one ``.flowpak``.

    ``shapes``: iterable of (height, width, batch) — e.g. the Sintel
    and KITTI serving resolutions plus a high-throughput batched entry.
    All entries share one copy of the weights; ``load_serving``
    dispatches per call on the input shape. Exports are still
    shape-specialized underneath (static shapes are what make the XLA
    programs fast); the bundle just ships the bucket set the eval
    path's %64 bucketing implies as ONE artifact. Single-chip entries
    only (data_parallel/spatial_tiles stay per-shape artifacts).
    """
    shapes = [tuple(int(v) for v in s) for s in shapes]
    if not shapes:
        raise ValueError("export_serving_bundle needs at least one shape")
    if len(set(shapes)) != len(shapes):
        raise ValueError(f"duplicate shapes in bundle: {shapes}")
    for h, w, b in shapes:
        if h % 64 or w % 64:
            raise ValueError(
                f"serving export shapes must be multiples of 64: {h}x{w}"
            )
    if compute_dtype == "bfloat16":
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params)

    exports = [
        _export_one(model_name, params, h, w, b, compute_dtype,
                    warp_mode, platforms, 0, 0, 0, fusion_res=1)
        for h, w, b in shapes
    ]
    params_bytes, bf16_leaves = _encode_params(params)
    meta = {
        "format_version": BUNDLE_FORMAT_VERSION,
        "model": model_name,
        "entries": [
            {"height": h, "width": w, "batch": b} for h, w, b in shapes
        ],
        "compute_dtype": compute_dtype,
        "warp_mode": warp_mode,
        "platforms": list(exports[0].platforms),
        "bf16_leaves": bf16_leaves,
    }
    with zipfile.ZipFile(os.fspath(out_path), "w", zipfile.ZIP_DEFLATED,
                         compresslevel=1) as z:
        for i, exp in enumerate(exports):
            z.writestr(f"exported_{i}.bin", exp.serialize())
        z.writestr("params.npz", params_bytes)
        z.writestr("meta.json", json.dumps(meta, indent=1))
    return meta


class ServingModel:
    """A deserialized .flowpak: call with (N,H,W,3) float32 pairs in [0,1].

    Does not import any model code — the graph lives in the artifact.
    """

    def __init__(self, exported, params, meta):
        self._exported = exported
        self._params = params
        self.meta = meta
        self._dp_call = None
        dp = meta.get("data_parallel", 0)
        sp = meta.get("spatial_tiles", 0)
        n_devices = max(dp, sp)
        if n_devices > 1:
            import jax

            if len(jax.devices()) < n_devices:
                raise ValueError(
                    f"artifact needs {n_devices} devices "
                    f"({'data_parallel' if dp > 1 else 'spatial_tiles'});"
                    f" only {len(jax.devices())} visible"
                )
            _, repl, batched = _serving_mesh(n_devices)
            # params live replicated on the mesh for the artifact's
            # lifetime; per-call work is just the input put (batch
            # sharded for DP, full frame replicated for spatial)
            self._in_sharding = batched if dp > 1 else repl
            self._out_sharding = batched if dp > 1 else repl
            self._params = jax.device_put(params, repl)
            self._dp_call = jax.jit(exported.call,
                                    out_shardings=self._out_sharding)

    def __call__(self, image_a, image_b):
        a = np.asarray(image_a, np.float32)
        b = np.asarray(image_b, np.float32)
        expect = (self.meta["batch"], self.meta["height"],
                  self.meta["width"], 3)
        if a.shape != expect or b.shape != expect:
            raise ValueError(
                f"artifact is specialized to inputs {expect}; got "
                f"{a.shape} / {b.shape}. Export one artifact per serving "
                "resolution (shapes are static by design)."
            )
        if self._dp_call is not None:
            import jax

            a = jax.device_put(a, self._in_sharding)
            b = jax.device_put(b, self._in_sharding)
            return np.asarray(self._dp_call(self._params, a, b))
        return np.asarray(self._exported.call(self._params, a, b))

    def infer_pair(self, image_a, image_b):
        """Serve one unbatched (H, W, 3) pair; H/W may be SMALLER than
        the artifact resolution — inputs are edge-padded up on the host
        and the flow cropped back (the %64 policy the eval path uses).
        Larger inputs need a larger artifact and error out.

        On a batch>1 artifact the pair is broadcast to the full batch —
        the StableHLO is shape-specialized, so a single pair costs
        batch-1 redundant forwards. That is fine for a DP-sharded
        artifact (the redundancy rides idle chips) but an 8x hidden
        cost on a single-chip b8 one, so the first such call warns
        (r3 review); batch callers should use ``__call__`` directly.
        """
        a = np.asarray(image_a, np.float32)
        b = np.asarray(image_b, np.float32)
        if a.ndim != 3 or a.shape != b.shape:
            raise ValueError(f"expected matching (H, W, 3) pairs: "
                             f"{a.shape} / {b.shape}")
        h, w = a.shape[:2]
        eh, ew = self.meta["height"], self.meta["width"]
        if h > eh or w > ew:
            raise ValueError(
                f"input {h}x{w} exceeds the artifact resolution "
                f"{eh}x{ew}; export a larger artifact."
            )
        pad = ((0, eh - h), (0, ew - w), (0, 0))
        a = np.pad(a, pad, mode="edge")
        b = np.pad(b, pad, mode="edge")
        if self.meta["batch"] != 1:
            per_chip = self.meta["batch"] // max(
                self.meta.get("data_parallel", 0), 1)
            if per_chip > 1 and not getattr(
                    self, "_warned_broadcast", False):
                self._warned_broadcast = True
                warnings.warn(
                    f"infer_pair on a batch={self.meta['batch']} "
                    f"artifact broadcasts the pair to the full batch "
                    f"({self.meta['batch'] - 1} redundant forwards per "
                    f"call); export a batch=1 artifact for single-pair "
                    f"serving, or call the model with full batches.",
                    stacklevel=2,
                )
            a = np.broadcast_to(a, (self.meta["batch"],) + a.shape)
            b = np.broadcast_to(b, (self.meta["batch"],) + b.shape)
        else:
            a, b = a[None], b[None]
        return self(a, b)[0, :h, :w]


class BundleServingModel:
    """A multi-shape .flowpak: per-call dispatch on the input shape.

    Entries share one weight copy; ``infer_pair`` picks the smallest
    batch-1 bucket that fits, pads up, and crops back.
    """

    def __init__(self, models, meta):
        self._models = models  # {(batch, height, width): ServingModel}
        self.meta = meta

    @property
    def shapes(self):
        return sorted(self._models)

    def __call__(self, image_a, image_b):
        # np.shape: dispatch needs only the shape — converting the whole
        # batch to float32 here would add a full-array copy per serving
        # call on top of ServingModel's own conversion
        shape = np.shape(image_a)
        key = (shape[0], shape[1], shape[2]) if len(shape) == 4 else None
        if key not in self._models:
            raise ValueError(
                f"no bundle entry for inputs {shape}; available "
                f"(batch, height, width): {self.shapes}"
            )
        return self._models[key](image_a, image_b)

    def infer_pair(self, image_a, image_b):
        a = np.asarray(image_a, np.float32)
        if a.ndim != 3:
            raise ValueError(f"expected one (H, W, 3) pair: {a.shape}")
        h, w = a.shape[:2]
        fits = [
            (eh * ew, b, eh, ew)
            for (b, eh, ew) in self._models
            if b == 1 and eh >= h and ew >= w
        ]
        if not fits:
            raise ValueError(
                f"no batch-1 bundle entry fits a {h}x{w} pair; available "
                f"(batch, height, width): {self.shapes}"
            )
        _, b, eh, ew = min(fits)
        return self._models[(b, eh, ew)].infer_pair(image_a, image_b)


def load_serving(path):
    """Load a .flowpak written by :func:`export_serving` (single shape)
    or :func:`export_serving_bundle` (shape-dispatching bundle)."""
    from jax import export as jexport

    from flownet2_tf_tpu.training import warmstart

    with zipfile.ZipFile(os.fspath(path)) as z:
        meta = json.loads(z.read("meta.json"))
        version = meta.get("format_version")
        if version not in (FORMAT_VERSION, BUNDLE_FORMAT_VERSION):
            raise ValueError(f"unsupported .flowpak version: {meta}")
        with np.load(io.BytesIO(z.read("params.npz"))) as npz:
            flat = dict(npz)
        for k in meta.get("bf16_leaves", ()):
            flat[k] = flat[k].view(_bf16_dtype())
        params = warmstart.unflatten(flat)
        if version == FORMAT_VERSION:
            exported = jexport.deserialize(z.read("exported.bin"))
            return ServingModel(exported, params, meta)
        models = {}
        for i, entry in enumerate(meta["entries"]):
            exported = jexport.deserialize(z.read(f"exported_{i}.bin"))
            entry_meta = dict(meta, **entry)
            models[(entry["batch"], entry["height"], entry["width"])] = (
                ServingModel(exported, params, entry_meta)
            )
    return BundleServingModel(models, meta)
