"""Kernel implementation dispatch: 'oracle' (pure jnp/XLA) vs 'pallas'.

The reference loads its CUDA ops from ``./build/*.so`` unconditionally
(reference ``src/correlation.py`` etc.). Here every op has two
implementations with identical numerics contracts:

* ``oracle`` — pure jax.numpy / lax. Always available (CPU/TPU), fully
  differentiable through autodiff. The correctness reference.
* ``pallas`` — hand-tiled Pallas TPU kernels with custom VJPs. The
  performance path on real TPU hardware.

``auto`` picks pallas on TPU backends when the op's fast path supports the
requested configuration, oracle otherwise.
"""

from __future__ import annotations

import contextlib
import os
import threading

_VALID = ("auto", "oracle", "pallas")

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


def backend_is_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
