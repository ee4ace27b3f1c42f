"""Kernel implementation dispatch: 'oracle' / 'mxu' / 'pallas'.

The reference loads its CUDA ops from ``./build/*.so`` unconditionally
(reference ``src/correlation.py`` etc.). Here every op has multiple
implementations with identical numerics contracts:

* ``oracle`` — pure jax.numpy / lax. Always available (CPU/TPU), fully
  differentiable through autodiff. The correctness reference.
* ``mxu`` — correlation only: the batched-einsum + skew-reshape
  formulation that puts the cost-volume contraction on the systolic
  array (``ops/correlation.py::_correlation_mxu``); the default
  performance path. Decided by the IN-MODEL A/B (FlowNetC 448x1024 b1
  bf16 end-to-end, benchmarks/results.json
  "correlation_in_model_flownetc"): mxu 2.94-2.99 ms vs oracle 3.72
  vs pallas 4.11.
* ``pallas`` — hand-tiled Pallas TPU kernels with custom VJPs. The
  correlation row kernel wins the ISOLATED sweep (0.97 vs 1.09 ms
  mxu) but loses in-model by ~1.1 ms (custom-call layout pinning +
  lost fusion; see ops/correlation.py docstring); it is kept as the
  interpret-mode sanitizer and for explicit use. flow_warp has no
  Pallas variant at all (Mosaic's only gather is a same-shape
  take-along-sublanes, which cannot express the warp); its
  'pallas'/'mxu' settings resolve to the packed-gather XLA path.

``auto`` picks the fastest measured implementation per op: 'mxu' for
correlation when the configuration supports it, the packed-gather XLA
path for flow_warp, 'oracle' otherwise.
"""

from __future__ import annotations

import contextlib
import os
import threading

_VALID = ("auto", "oracle", "mxu", "pallas")

_state = threading.local()


def _default():
    return os.environ.get("FLOWNET2_TPU_KERNELS", "auto")


def get_implementation() -> str:
    impl = getattr(_state, "impl", None)
    if impl is None:
        impl = _default()
    if impl not in _VALID:
        raise ValueError(f"bad kernel implementation {impl!r}; one of {_VALID}")
    return impl


def set_implementation(impl: str) -> None:
    if impl not in _VALID:
        raise ValueError(f"bad kernel implementation {impl!r}; one of {_VALID}")
    _state.impl = impl


@contextlib.contextmanager
def use_implementation(impl: str):
    prev = getattr(_state, "impl", None)
    set_implementation(impl)
    try:
        yield
    finally:
        _state.impl = prev


def get_s2d_override():
    """Thread-local override for the S2D head transform: None (use the
    env-var defaults in ``models.common``), True, or False.

    ADVICE r2: the S2D gates were module globals read at trace time, so
    two configurations could not coexist in one process. A/B harnesses
    and tests should prefer :func:`use_s2d` over monkeypatching the
    ``models.common`` globals.
    """
    return getattr(_state, "s2d", None)


@contextlib.contextmanager
def use_s2d(enabled):
    """Force the S2D head transform on/off (or None = defaults) for
    model traces on this thread."""
    prev = getattr(_state, "s2d", None)
    _state.s2d = enabled
    try:
        yield
    finally:
        _state.s2d = prev


def get_f32_features_precision() -> str:
    """Matmul precision for FEATURE convs (act=True) on the f32 parity
    path: 'highest' (default — owns the <=1e-2 EPE parity budget) or
    'default' (XLA DEFAULT, ~bf16 operand rounding, ~2x faster). Flow
    heads/upsamplers keep HIGHEST either way. Measured trade in
    docs/DESIGN.md (VERDICT r2 #9)."""
    mode = getattr(_state, "f32_features_precision", None)
    if mode is None:
        mode = os.environ.get("FLOWNET2_TPU_F32_FEATURES", "highest")
    if mode not in ("highest", "default"):
        raise ValueError(
            f"f32 features precision must be 'highest'|'default', got "
            f"{mode!r}"
        )
    return mode


@contextlib.contextmanager
def use_f32_features_precision(mode: str):
    if mode not in ("highest", "default"):
        # eager, like set_implementation — an invalid mode must not
        # surface only later, mid-trace, from the getter
        raise ValueError(
            f"f32 features precision must be 'highest'|'default', got "
            f"{mode!r}"
        )
    prev = getattr(_state, "f32_features_precision", None)
    _state.f32_features_precision = mode
    try:
        yield
    finally:
        _state.f32_features_precision = prev


def get_bf16_interconv() -> bool:
    """Whether UNACTIVATED interconv refinement layers (FlowNetSD
    interconv5..2, fusion fuse_interconv1/0) follow the bf16 compute
    policy instead of the f32 flow-head treatment.

    The f32-head policy exists because flow VALUES need precision, and
    heads are 2-channel so the cost is nil — but the interconvs are
    FEATURE-scale (SD interconv5 is 1026->512: an 18.9 MB f32 weight
    streamed per forward, the single largest async copy in the r3
    serving profile). Their output feeds a flow head that stays f32
    either way. Default off (exact path); the serving preset enables
    it (measured speed/accuracy trade in docs/DESIGN.md)."""
    flag = getattr(_state, "bf16_interconv", None)
    if flag is None:
        return os.environ.get("FLOWNET2_TPU_BF16_INTERCONV", "0") == "1"
    return bool(flag)


@contextlib.contextmanager
def use_bf16_interconv(enabled):
    """Force bf16 interconvs on/off (or None = env default) for model
    traces on this thread."""
    prev = getattr(_state, "bf16_interconv", None)
    _state.bf16_interconv = enabled
    try:
        yield
    finally:
        _state.bf16_interconv = prev


def get_half_res_warp():
    """Thread-local override for half-resolution warping: None (use the
    ``FLOWNET2_TPU_HALF_RES_WARP`` env default in ``ops.flow_warp``),
    True, or False. Subsumed by :func:`get_warp_res` (a warp_res
    override takes precedence); kept as the stable public knob for the
    measured-and-adopted serving preset (k=2)."""
    return getattr(_state, "half_res_warp", None)


@contextlib.contextmanager
def use_half_res_warp(enabled):
    """Force half-resolution stack warps on/off (or None = default) for
    model traces on this thread. See ops/flow_warp.py::flow_warp_half."""
    prev = getattr(_state, "half_res_warp", None)
    _state.half_res_warp = enabled
    try:
        yield
    finally:
        _state.half_res_warp = prev


_WARP_RES_VALID = (1, 2, 4)


def get_warp_res():
    """Thread-local override for the stack-warp coordinate-grid factor:
    None (defer to half_res_warp / env defaults), or 1 / 2 / 4.

    The warp gather is issue-rate-bound (~4.5 ns/record,
    docs/DESIGN.md), so a k-times-coarser grid cuts its cost ~k^2; the
    warped image is upsampled back. k=2 is the measured serving preset;
    k=4 exists for the quarter-res experiment (benchmarks/
    warp_res_ab.py) — check the measured AEE deltas before enabling."""
    return getattr(_state, "warp_res", None)


@contextlib.contextmanager
def use_warp_res(k):
    """Force the stack-warp grid factor to ``k`` (1 = exact full-res,
    2 = half, 4 = quarter; None = defaults) for model traces on this
    thread."""
    if k is not None and k not in _WARP_RES_VALID:
        raise ValueError(
            f"warp_res must be one of {_WARP_RES_VALID} or None, got {k!r}"
        )
    prev = getattr(_state, "warp_res", None)
    _state.warp_res = k
    try:
        yield
    finally:
        _state.warp_res = prev


_FUSION_RES_VALID = (1, 2)


def get_fusion_res() -> int:
    """Resolution factor for the FlowNet2 FUSION network: 1 (exact,
    default) or 2 (serving approximation — the whole fusion pyramid
    runs on a half-resolution input assembly and only the final flow is
    resized back up).

    Rationale (VERDICT r4 #4 "change WHAT is computed"): the fusion
    net's level-0 chain and input assembly run at full 448x1024 with
    2-16 output channels — lane-starved shapes the MXU cannot tile
    efficiently, a fixed per-pair cost that batching never amortizes
    (op ledger: fusion-attributed convs are flat b1 vs b8 per pair).
    Halving the grid quarters that work. Branch flows are quarter-res
    fields upsampled anyway, so the flow inputs lose nothing; the
    brightness errors and image evidence lose one octave. The measured
    AEE cost on trained weights is the adoption criterion
    (benchmarks/fusion_res_ab.py)."""
    k = getattr(_state, "fusion_res", None)
    if k is None:
        k = int(os.environ.get("FLOWNET2_TPU_FUSION_RES", "1"))
    if k not in _FUSION_RES_VALID:
        raise ValueError(
            f"fusion_res must be one of {_FUSION_RES_VALID}, got {k!r}"
        )
    return int(k)


@contextlib.contextmanager
def use_fusion_res(k):
    """Force the fusion-net grid factor (1 = exact, 2 = half; None =
    env default) for model traces on this thread."""
    if k is not None and k not in _FUSION_RES_VALID:
        raise ValueError(
            f"fusion_res must be one of {_FUSION_RES_VALID} or None, "
            f"got {k!r}"
        )
    prev = getattr(_state, "fusion_res", None)
    _state.fusion_res = k
    try:
        yield
    finally:
        _state.fusion_res = prev


_WARP_SRC_VALID = ("float32", "bfloat16")


def get_warp_source_dtype() -> str:
    """Storage dtype for the COARSE (k>1) stack-warp source chain —
    pooled image, packed 4-tap table, gathered records ('float32'
    default, or 'bfloat16'). Coordinates and the flow math stay f32
    regardless. Only the approximate serving-preset warps are affected;
    the k=1 exact path never consults this. bf16 halves the
    issue-rate-bound gather's traffic AND is cast-free when the source
    comes from the model's own bf16 S2D fold (the image_s2d plumbing) —
    unlike the r2 full-res gather_dtype experiment, which paid an f32
    relayout around the table build. MEASURED r4
    (benchmarks/warp_src_ab.py -> results.json::warp_src_ab) and
    REJECTED as a default: AEE cost is nil (+0.0001-0.0003 px on
    trained weights) and b1 is noise-neutral (14.25 vs 14.09-14.53),
    but b8 REGRESSES 13.0 -> 16.8 ms/pair — the gather emitter's bf16
    operand path loses more at batch than the halved traffic saves.
    Default 'float32'; the knob stays for shapes/backends where the
    bf16 path wins."""
    mode = getattr(_state, "warp_source_dtype", None)
    if mode is None:
        mode = os.environ.get("FLOWNET2_TPU_WARP_SRC", "float32")
    if mode not in _WARP_SRC_VALID:
        raise ValueError(
            f"warp source dtype must be one of {_WARP_SRC_VALID}, got "
            f"{mode!r}"
        )
    return mode


@contextlib.contextmanager
def use_warp_source_dtype(mode):
    """Force the coarse-warp source dtype ('float32'/'bfloat16'; None =
    env default) for model traces on this thread."""
    if mode is not None and mode not in _WARP_SRC_VALID:
        raise ValueError(
            f"warp source dtype must be one of {_WARP_SRC_VALID} or "
            f"None, got {mode!r}"
        )
    prev = getattr(_state, "warp_source_dtype", None)
    _state.warp_source_dtype = mode
    try:
        yield
    finally:
        _state.warp_source_dtype = prev


def trace_signature() -> tuple:
    """Hashable snapshot of every dispatch knob that shapes a model
    trace.

    Model code reads these thread-locals/envs AT TRACE TIME, so any
    long-lived ``jax.jit`` wrapper around ``model.apply`` (the library
    inference/eval/spatial entry points) must include this tuple as a
    static argument — otherwise a call under a different
    ``use_half_res_warp``/``use_implementation``/... context silently
    hits the cache entry traced under the OLD configuration.

    Deliberately NOT included (import-frozen knobs): env vars read once
    at module import — ``FLOWNET2_TPU_POOL2`` (models/common.py) and
    ``FLOWNET2_TPU_UNROLL_MAX`` (ops/sampling.py). They cannot change
    within a process, so they cannot invalidate a cache entry; A/Bs over
    them must use a fresh subprocess per value (see benchmarks/pool_ab.py
    and benchmarks/unroll_ab.py)."""
    from flownet2_tf_tpu.ops.flow_warp import stack_warp_res
    from flownet2_tf_tpu.models import common as _common

    return (
        get_implementation(),
        _common.s2d_heads(),
        _common.S2D_HEAD7 if get_s2d_override() is None
        else ("override", bool(get_s2d_override())),
        get_f32_features_precision(),
        stack_warp_res(),
        get_bf16_interconv(),
        get_warp_source_dtype(),
        get_fusion_res(),
    )


def backend_is_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
