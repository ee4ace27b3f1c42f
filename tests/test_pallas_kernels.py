"""Pallas kernel parity vs the jnp oracles (run in interpreter mode on
the CPU test backend; compiled parity is exercised by bench/TPU runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from flownet2_tf_tpu.ops.correlation import _correlation_oracle
from flownet2_tf_tpu.ops.pallas.correlation_kernel import (
    correlation_pallas,
    pallas_correlation_supported,
)

# quick tier (VERDICT r4 #8): kernel-parity/IO modules cheap enough to
# run on every change — `pytest -m quick` stays under 3 minutes on CPU
pytestmark = pytest.mark.quick


def _pallas_interp():
    return pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize(
    "shape,cfg",
    [
        ((1, 16, 16, 128), dict(max_displacement=4, stride_2=2)),
        ((2, 8, 24, 128), dict(max_displacement=4, stride_2=2)),
        ((1, 12, 16, 256), dict(max_displacement=6, stride_2=2)),
        ((1, 8, 16, 128), dict(max_displacement=3, stride_2=1)),
    ],
)
def test_correlation_pallas_matches_oracle(rng, shape, cfg):
    a = jnp.asarray(rng.randn(*shape).astype(np.float32))
    b = jnp.asarray(rng.randn(*shape).astype(np.float32))
    kwargs = dict(
        kernel_size=1,
        max_displacement=cfg["max_displacement"],
        stride_1=1,
        stride_2=cfg["stride_2"],
        pad=cfg["max_displacement"],
    )
    assert pallas_correlation_supported(shape, **kwargs)
    want = np.asarray(_correlation_oracle(a, b, *(kwargs[k] for k in (
        "kernel_size", "max_displacement", "stride_1", "stride_2", "pad"
    ))))
    with _pallas_interp():
        got = np.asarray(correlation_pallas(a, b, **kwargs))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_correlation_pallas_bf16_inputs(rng):
    shape = (1, 8, 16, 128)
    a = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
    kwargs = dict(kernel_size=1, max_displacement=4, stride_1=1,
                  stride_2=2, pad=4)
    want = np.asarray(
        _correlation_oracle(
            a.astype(jnp.float32), b.astype(jnp.float32),
            1, 4, 1, 2, 4,
        )
    )
    with _pallas_interp():
        got = np.asarray(correlation_pallas(a, b, **kwargs))
    # bf16 inputs, f32 accumulation: tolerance at bf16 input rounding
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_correlation_pallas_gradient_matches_oracle(rng):
    shape = (1, 8, 16, 128)
    a = jnp.asarray(rng.randn(*shape).astype(np.float32))
    b = jnp.asarray(rng.randn(*shape).astype(np.float32))
    kwargs = dict(kernel_size=1, max_displacement=4, stride_1=1,
                  stride_2=2, pad=4)

    def loss_pallas(a, b):
        with _pallas_interp():
            return jnp.sum(correlation_pallas(a, b, **kwargs) ** 2)

    def loss_oracle(a, b):
        return jnp.sum(_correlation_oracle(a, b, 1, 4, 1, 2, 4) ** 2)

    ga_p, gb_p = jax.grad(loss_pallas, argnums=(0, 1))(a, b)
    ga_o, gb_o = jax.grad(loss_oracle, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_o),
                               rtol=1e-4, atol=1e-4)


def test_unsupported_config_falls_back(rng):
    # W not a multiple of 8 -> oracle fallback, same result
    shape = (1, 8, 12, 64)
    a = jnp.asarray(rng.randn(*shape).astype(np.float32))
    b = jnp.asarray(rng.randn(*shape).astype(np.float32))
    kwargs = dict(kernel_size=1, max_displacement=4, stride_1=1,
                  stride_2=2, pad=4)
    assert not pallas_correlation_supported(shape, **kwargs)
    got = np.asarray(correlation_pallas(a, b, **kwargs))
    want = np.asarray(_correlation_oracle(a, b, 1, 4, 1, 2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dispatch_auto_uses_mxu_when_supported(rng):
    import importlib

    # the ops package re-exports the function under the module's name,
    # so resolve the module explicitly
    corr_mod = importlib.import_module("flownet2_tf_tpu.ops.correlation")

    # auto resolves to the MXU einsum path for the FlowNetC config
    # family (any backend — it is pure XLA) and must match the oracle
    a = rng.randn(1, 8, 16, 128).astype(np.float32)
    b = rng.randn(1, 8, 16, 128).astype(np.float32)
    assert corr_mod._mxu_supported(1, 4, 1, 2, 4)
    out = corr_mod.correlation(a, b, 1, 4, 1, 2, 4)  # impl = auto
    want = np.asarray(_correlation_oracle(
        jnp.asarray(a), jnp.asarray(b), 1, 4, 1, 2, 4))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)

    # off the fast path (kernel_size 3), auto falls back to the oracle
    assert not corr_mod._mxu_supported(3, 4, 1, 2, 4)
    out3 = corr_mod.correlation(a, b, 3, 4, 1, 2, 4)
    want3 = np.asarray(_correlation_oracle(
        jnp.asarray(a), jnp.asarray(b), 3, 4, 1, 2, 4))
    np.testing.assert_allclose(np.asarray(out3), want3, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape,cfg",
    [
        ((1, 16, 16, 128), dict(max_displacement=4, stride_2=2)),
        ((2, 8, 24, 64), dict(max_displacement=4, stride_2=2)),
        ((1, 12, 16, 256), dict(max_displacement=6, stride_2=2)),
        ((1, 8, 16, 128), dict(max_displacement=3, stride_2=1)),
        ((1, 8, 20, 32), dict(max_displacement=6, stride_2=3)),
    ],
)
def test_correlation_mxu_matches_oracle(rng, shape, cfg):
    from flownet2_tf_tpu.ops.correlation import _correlation_mxu

    a = jnp.asarray(rng.randn(*shape).astype(np.float32))
    b = jnp.asarray(rng.randn(*shape).astype(np.float32))
    args = (1, cfg["max_displacement"], 1, cfg["stride_2"],
            cfg["max_displacement"])
    want = np.asarray(_correlation_oracle(a, b, *args))
    got = np.asarray(_correlation_mxu(a, b, *args))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_correlation_mxu_gradient_matches_oracle(rng):
    from flownet2_tf_tpu.ops.correlation import _correlation_mxu

    shape = (1, 8, 16, 64)
    a = jnp.asarray(rng.randn(*shape).astype(np.float32))
    b = jnp.asarray(rng.randn(*shape).astype(np.float32))
    args = (1, 4, 1, 2, 4)
    ga_o, gb_o = jax.grad(
        lambda a, b: jnp.sum(_correlation_oracle(a, b, *args) ** 2),
        argnums=(0, 1),
    )(a, b)
    ga_m, gb_m = jax.grad(
        lambda a, b: jnp.sum(_correlation_mxu(a, b, *args) ** 2),
        argnums=(0, 1),
    )(a, b)
    np.testing.assert_allclose(np.asarray(ga_m), np.asarray(ga_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_m), np.asarray(gb_o),
                               rtol=1e-4, atol=1e-4)
