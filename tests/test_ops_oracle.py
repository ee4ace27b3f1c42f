"""Unit tests for the jnp oracle kernels: correlation, flow_warp,
downsample, TF1 bilinear resize — numerics vs independent NumPy
implementations plus gradient checks (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.ops import (
    correlation,
    downsample,
    flow_warp,
    resize_bilinear_tf1,
)
from flownet2_tf_tpu.ops.correlation import correlation_output_shape

# quick tier (VERDICT r4 #8): kernel-parity/IO modules cheap enough to
# run on every change — `pytest -m quick` stays under 3 minutes on CPU
pytestmark = pytest.mark.quick


# ---------------------------------------------------------------------------
# NumPy reference implementations (deliberately naive & loopy)
# ---------------------------------------------------------------------------

def np_correlation(a, b, kernel_size, max_displacement, stride_1, stride_2,
                   pad):
    n, h, w, c = a.shape
    kr = (kernel_size - 1) // 2
    border = max_displacement + kr
    out_h = -(-(h + 2 * pad - 2 * border) // stride_1)
    out_w = -(-(w + 2 * pad - 2 * border) // stride_1)
    r = max_displacement // stride_2
    d = 2 * r + 1

    ap = np.pad(a, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    bp = np.pad(b, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((n, out_h, out_w, d * d), dtype=np.float64)
    for ni in range(n):
        for yo in range(out_h):
            for xo in range(out_w):
                y1 = border + yo * stride_1
                x1 = border + xo * stride_1
                patch_a = ap[ni, y1 - kr:y1 + kr + 1, x1 - kr:x1 + kr + 1]
                for dyi, dy in enumerate(range(-r, r + 1)):
                    for dxi, dx in enumerate(range(-r, r + 1)):
                        y2 = y1 + dy * stride_2
                        x2 = x1 + dx * stride_2
                        patch_b = bp[ni, y2 - kr:y2 + kr + 1,
                                     x2 - kr:x2 + kr + 1]
                        out[ni, yo, xo, dyi * d + dxi] = np.sum(
                            patch_a * patch_b
                        )
    return out / (kernel_size * kernel_size * c)


def np_flow_warp(image, flow):
    n, h, w, c = image.shape
    out = np.zeros_like(image, dtype=np.float64)
    for ni in range(n):
        for y in range(h):
            for x in range(w):
                x2 = x + flow[ni, y, x, 0]
                y2 = y + flow[ni, y, x, 1]
                x0, y0 = np.floor(x2), np.floor(y2)
                wx, wy = x2 - x0, y2 - y0
                x0i = int(np.clip(x0, 0, w - 1))
                x1i = int(np.clip(x0 + 1, 0, w - 1))
                y0i = int(np.clip(y0, 0, h - 1))
                y1i = int(np.clip(y0 + 1, 0, h - 1))
                top = image[ni, y0i, x0i] * (1 - wx) + image[ni, y0i, x1i] * wx
                bot = image[ni, y1i, x0i] * (1 - wx) + image[ni, y1i, x1i] * wx
                out[ni, y, x] = top * (1 - wy) + bot * wy
    return out


# ---------------------------------------------------------------------------
# Correlation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "cfg",
    [
        dict(kernel_size=1, max_displacement=4, stride_1=1, stride_2=2, pad=4),
        dict(kernel_size=1, max_displacement=3, stride_1=1, stride_2=1, pad=3),
        dict(kernel_size=3, max_displacement=2, stride_1=1, stride_2=1, pad=3),
        dict(kernel_size=1, max_displacement=4, stride_1=2, stride_2=2, pad=4),
    ],
)
def test_correlation_matches_numpy(rng, cfg):
    a = rng.randn(2, 12, 14, 5).astype(np.float32)
    b = rng.randn(2, 12, 14, 5).astype(np.float32)
    got = np.asarray(correlation(a, b, implementation="oracle", **cfg))
    want = np_correlation(a, b, **{k: cfg[k] for k in cfg})
    assert got.shape == correlation_output_shape(a.shape, **cfg)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_correlation_flownetc_config_shape(rng):
    """The real FlowNetC call: 441 channels, same spatial size."""
    a = rng.randn(1, 24, 32, 8).astype(np.float32)
    b = rng.randn(1, 24, 32, 8).astype(np.float32)
    out = correlation(a, b, 1, 20, 1, 2, 20, implementation="oracle")
    assert out.shape == (1, 24, 32, 441)


def test_correlation_self_peak(rng):
    """Correlating a unit-norm map with itself peaks at zero displacement
    (Cauchy-Schwarz: a.b <= |a||b| = 1 = a.a)."""
    a = rng.randn(1, 16, 16, 4).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    out = np.asarray(
        correlation(a, a, 1, 4, 1, 2, 4, implementation="oracle")
    )
    d = 5  # grid width for r=2
    center = d * d // 2
    interior = out[0, 4:-4, 4:-4]
    assert np.all(interior.argmax(axis=-1) == center)


def test_correlation_grads(rng):
    a = jnp.asarray(rng.randn(1, 8, 9, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 8, 9, 3).astype(np.float32))

    def f(a, b):
        return jnp.sum(
            correlation(a, b, 1, 2, 1, 1, 2, implementation="oracle") ** 2
        )

    from jax.test_util import check_grads

    check_grads(f, (a, b), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


# ---------------------------------------------------------------------------
# Flow warp
# ---------------------------------------------------------------------------

def test_flow_warp_matches_numpy(rng):
    img = rng.rand(2, 10, 12, 3).astype(np.float32)
    flow = (rng.rand(2, 10, 12, 2).astype(np.float32) - 0.5) * 6
    got = np.asarray(flow_warp(img, flow, implementation="oracle"))
    want = np_flow_warp(img, flow)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flow_warp_zero_flow_identity(rng):
    img = rng.rand(1, 8, 8, 3).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), dtype=np.float32)
    got = np.asarray(flow_warp(img, flow, implementation="oracle"))
    np.testing.assert_allclose(got, img, rtol=1e-6, atol=1e-6)


def test_flow_warp_integer_shift(rng):
    """Flow (+1, 0) everywhere samples one pixel to the right."""
    img = rng.rand(1, 6, 7, 2).astype(np.float32)
    flow = np.zeros((1, 6, 7, 2), dtype=np.float32)
    flow[..., 0] = 1.0
    got = np.asarray(flow_warp(img, flow, implementation="oracle"))
    np.testing.assert_allclose(got[0, :, :-1], img[0, :, 1:], atol=1e-6)
    # last column clamps to the border
    np.testing.assert_allclose(got[0, :, -1], img[0, :, -1], atol=1e-6)


def test_flow_warp_border_zero_mode(rng):
    img = rng.rand(1, 6, 6, 1).astype(np.float32) + 1.0
    flow = np.zeros((1, 6, 6, 2), dtype=np.float32)
    flow[..., 0] = 100.0  # everything lands far out of frame
    got = np.asarray(
        flow_warp(img, flow, border="zero", implementation="oracle")
    )
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_flow_warp_grads(rng):
    img = jnp.asarray(rng.rand(1, 6, 6, 2).astype(np.float32))
    # keep flow away from integer lattice points (floor() kinks)
    flow = jnp.asarray(
        (rng.rand(1, 6, 6, 2).astype(np.float32) - 0.5) * 2 + 0.3
    )

    def f(img, flow):
        return jnp.sum(flow_warp(img, flow, implementation="oracle") ** 2)

    from jax.test_util import check_grads

    check_grads(f, (img, flow), order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


# ---------------------------------------------------------------------------
# Downsample
# ---------------------------------------------------------------------------

def test_downsample_integer_factor_is_avgpool(rng):
    x = rng.randn(2, 8, 12, 2).astype(np.float32)
    got = np.asarray(downsample(x, (4, 6)))
    want = x.reshape(2, 4, 2, 6, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_downsample_preserves_constant(rng):
    x = np.full((1, 12, 20, 2), 3.25, dtype=np.float32)
    got = np.asarray(downsample(x, (5, 7)))  # fractional factors
    np.testing.assert_allclose(got, 3.25, rtol=1e-5)


def test_downsample_fractional_mean_preserved(rng):
    x = rng.randn(1, 9, 15, 1).astype(np.float32)
    got = np.asarray(downsample(x, (3, 5)))
    np.testing.assert_allclose(got.mean(), x.mean(), rtol=1e-4, atol=1e-5)


def test_downsample_identity(rng):
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(downsample(x, (6, 6))), x)


# ---------------------------------------------------------------------------
# TF1 bilinear resize
# ---------------------------------------------------------------------------

def np_tf1_resize_bilinear(x, out_h, out_w):
    n, h, w, c = x.shape
    out = np.zeros((n, out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            sy = i * h / out_h
            sx = j * w / out_w
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            wy, wx = sy - y0, sx - x0
            top = x[:, y0, x0] * (1 - wx) + x[:, y0, x1] * wx
            bot = x[:, y1, x0] * (1 - wx) + x[:, y1, x1] * wx
            out[:, i, j] = top * (1 - wy) + bot * wy
    return out


def test_resize_bilinear_tf1_matches_numpy(rng):
    x = rng.randn(2, 6, 8, 3).astype(np.float32)
    got = np.asarray(resize_bilinear_tf1(x, 13, 17))
    want = np_tf1_resize_bilinear(x, 13, 17)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_resize_bilinear_tf1_matches_tensorflow(rng):
    tf = pytest.importorskip("tensorflow")
    x = rng.randn(1, 12, 16, 2).astype(np.float32)
    want = tf.compat.v1.image.resize_bilinear(
        tf.constant(x), (96, 128)
    ).numpy()
    got = np.asarray(resize_bilinear_tf1(x, 96, 128))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_upsample_x2_exact_corners(rng):
    x = rng.randn(1, 4, 4, 1).astype(np.float32)
    got = np.asarray(resize_bilinear_tf1(x, 8, 8))
    # TF1 convention: out[2i, 2j] == in[i, j] exactly
    np.testing.assert_allclose(got[0, ::2, ::2, 0], x[0, :, :, 0], atol=1e-6)


def test_correlation_explicit_mxu_guards_unsupported_configs(rng):
    """Explicit implementation='mxu' must fall back to the oracle for
    configs outside the MXU fast path's family instead of silently
    computing a wrong cost volume (kernel_size/stride_1/pad ignored)."""
    from flownet2_tf_tpu.ops.correlation import correlation

    a = jnp.asarray(rng.randn(1, 16, 20, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 16, 20, 8).astype(np.float32))
    # kernel_size=3 is outside the mxu family
    want = correlation(a, b, 3, 4, 1, 2, 4, implementation="oracle")
    got = correlation(a, b, 3, 4, 1, 2, 4, implementation="mxu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # d % stride_2 != 0 is outside the family too
    want = correlation(a, b, 1, 5, 1, 2, 5, implementation="oracle")
    got = correlation(a, b, 1, 5, 1, 2, 5, implementation="mxu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flow_warp_multi_matches_flow_warp(rng):
    """flow_warp_multi (one shared packed table, M flows over one image)
    must equal M independent flow_warp calls exactly."""
    from flownet2_tf_tpu.ops.flow_warp import flow_warp, flow_warp_multi

    img = jnp.asarray(rng.rand(1, 24, 32, 3).astype(np.float32))
    flows = jnp.asarray(
        (rng.rand(3, 24, 32, 2).astype(np.float32) - 0.5) * 12
    )
    multi = np.asarray(flow_warp_multi(img, flows))
    for j in range(3):
        single = np.asarray(flow_warp(img, flows[j : j + 1]))
        np.testing.assert_array_equal(multi[j : j + 1], single)

    with pytest.raises(ValueError):
        flow_warp_multi(jnp.zeros((2, 24, 32, 3)), flows)  # batch != 1


def test_bilinear_gather_large_batch_lax_map_path(rng):
    """Batches above _UNROLL_MAX_SAMPLES take the lax.map body (bounded
    HLO for augmentation-path batch sizes, ADVICE r2); the mapped path
    must match the unrolled per-sample path exactly."""
    from flownet2_tf_tpu.ops import sampling

    n = sampling._UNROLL_MAX_SAMPLES + 3
    img = jnp.asarray(rng.rand(n, 12, 16, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(n, 12, 16).astype(np.float32) * 15)
    y2 = jnp.asarray(rng.rand(n, 12, 16).astype(np.float32) * 11)

    mapped = np.asarray(sampling.bilinear_gather(img, x2, y2))
    per_sample = np.concatenate([
        np.asarray(
            sampling.bilinear_gather(
                img[i : i + 1], x2[i : i + 1], y2[i : i + 1]
            )
        )
        for i in range(n)
    ])
    # different compiled programs may reassociate the lerp by 1 ULP
    np.testing.assert_allclose(mapped, per_sample, rtol=0, atol=1e-6)

    # and it must stay differentiable (augmentation backprops through it)
    def f(im):
        return sampling.bilinear_gather(im, x2, y2).sum()

    g = jax.grad(f)(img)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# Half-resolution stack warp (flag-gated approximation)
# ---------------------------------------------------------------------------

def test_pool2_impls_equivalent(rng):
    """The five _pool2 lowerings (FLOWNET2_TPU_POOL2: reshape / window /
    slices / conv / fold) are the same 2x2 area average up to f32
    reassociation — speed alone picks the default (benchmarks/
    pool_ab.py)."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")

    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    ref = np.asarray(x).reshape(2, 8, 2, 12, 2, 3).mean(axis=(2, 4))
    orig = fw._POOL2_IMPL
    try:
        for impl in fw._POOL2_VALID:
            fw._POOL2_IMPL = impl
            np.testing.assert_allclose(
                np.asarray(fw._pool2(x)), ref, rtol=0, atol=1e-6,
                err_msg=impl,
            )
    finally:
        fw._POOL2_IMPL = orig


def test_stack_warp_defaults_to_full_res(rng):
    """With the flag off (default), stack_warp IS flow_warp."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")

    img = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
    flo = jnp.asarray((rng.rand(1, 16, 24, 2) * 4 - 2).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(fw.stack_warp(img, flo)),
        np.asarray(fw.flow_warp(img, flo)),
    )


def test_flow_warp_half_close_on_smooth_content(rng):
    """On smooth (bilinear-representable) image content and smooth flow,
    the half-res warp approximates the full-res warp closely — the
    regime trained stage flows live in (they are upsampled quarter-res
    fields)."""
    from flownet2_tf_tpu.ops import dispatch
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")

    h, w = 32, 48
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # smooth image: low-frequency gradients per channel
    img = np.stack(
        [xx / w, yy / h, (xx + yy) / (h + w)], axis=-1
    )[None].astype(np.float32)
    # smooth flow field
    flo = np.stack(
        [1.5 + 0.01 * yy, -0.75 + 0.01 * xx], axis=-1
    )[None].astype(np.float32)

    full = np.asarray(fw.flow_warp(jnp.asarray(img), jnp.asarray(flo)))
    half = np.asarray(fw.flow_warp_half(jnp.asarray(img), jnp.asarray(flo)))
    assert half.shape == full.shape
    # interior agreement (borders differ: clamp happens at half res)
    err = np.abs(half - full)[:, 2:-2, 2:-2, :]
    assert err.mean() < 5e-3, err.mean()

    with dispatch.use_half_res_warp(True):
        routed = np.asarray(
            fw.stack_warp(jnp.asarray(img), jnp.asarray(flo))
        )
    np.testing.assert_array_equal(routed, half)


def test_flow_warp_multi_half_matches_single(rng):
    """The multi-flow half-res warp equals per-flow half-res warps."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")

    img = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
    flows = jnp.asarray((rng.rand(2, 16, 24, 2) * 3 - 1.5).astype(np.float32))

    multi = np.asarray(fw.flow_warp_multi_half(img, flows))
    singles = np.concatenate(
        [
            np.asarray(fw.flow_warp_half(img, flows[i : i + 1]))
            for i in range(2)
        ]
    )
    np.testing.assert_allclose(multi, singles, rtol=0, atol=1e-6)


def test_flow_warp_half_differentiable(rng):
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")

    img = jnp.asarray(rng.rand(1, 8, 12, 3).astype(np.float32))
    flo = jnp.asarray((rng.rand(1, 8, 12, 2) * 2 - 1).astype(np.float32))

    g_img = jax.grad(lambda im: fw.flow_warp_half(im, flo).sum())(img)
    g_flo = jax.grad(lambda fl: fw.flow_warp_half(img, fl).sum())(flo)
    assert np.all(np.isfinite(np.asarray(g_img)))
    assert np.all(np.isfinite(np.asarray(g_flo)))


# ---------------------------------------------------------------------------
# S2D (phase-major) stack warps — the r3 stage-2 assembly primitives
# ---------------------------------------------------------------------------

def test_stack_warp_s2d_matches_folded_full_res(rng):
    """stack_warp_s2d == space_to_depth(stack_warp): the phase reorder
    lives in the gather's index values, so the outputs must agree
    exactly (same taps, same lerp)."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    from flownet2_tf_tpu.models import common

    img = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    flo = jnp.asarray((rng.rand(2, 16, 24, 2) * 5 - 2.5).astype(np.float32))

    got = np.asarray(fw.stack_warp_s2d(img, flo))
    want = np.asarray(common.space_to_depth(fw.stack_warp(img, flo)))
    assert got.shape == (2, 8, 12, 12)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_stack_warp_multi_s2d_matches_folded(rng):
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    from flownet2_tf_tpu.models import common

    img = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
    flows = jnp.asarray((rng.rand(2, 16, 24, 2) * 3 - 1.5).astype(np.float32))

    got = np.asarray(fw.stack_warp_multi_s2d(img, flows))
    want = np.asarray(common.space_to_depth(fw.stack_warp_multi(img, flows)))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_stack_warp_s2d_half_res_mode(rng):
    """In half-res mode the S2D stack warp equals the fold of the
    plain half-res warp to float-rounding level (the upsample phases
    are computed analytically instead of resize-then-fold)."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    from flownet2_tf_tpu.models import common
    from flownet2_tf_tpu.ops import dispatch

    img = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
    flo = jnp.asarray((rng.rand(1, 16, 24, 2) * 3 - 1.5).astype(np.float32))

    with dispatch.use_half_res_warp(True):
        got = np.asarray(fw.stack_warp_s2d(img, flo))
        want = np.asarray(common.space_to_depth(fw.stack_warp(img, flo)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_stack_warp_s2d_quarter_res_mode(rng):
    """k=4: every stack_warp_s2d* variant equals the fold of the plain
    quarter-res warp (which pools by 4 and upsamples 4x via one real
    2x resize + the analytic encoded 2x — dyadic TF1 resizes compose
    exactly)."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    from flownet2_tf_tpu.models import common
    from flownet2_tf_tpu.ops import dispatch

    img = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
    flo = jnp.asarray((rng.rand(1, 16, 24, 2) * 3 - 1.5).astype(np.float32))
    flows = jnp.asarray((rng.rand(2, 16, 24, 2) * 3 - 1.5).astype(np.float32))

    with dispatch.use_warp_res(4):
        assert fw.stack_warp_res() == 4
        got = np.asarray(fw.stack_warp_s2d(img, flo))
        want = np.asarray(common.space_to_depth(fw.stack_warp(img, flo)))
        got_m = np.asarray(fw.stack_warp_multi_s2d(img, flows))
        want_m = np.asarray(
            common.space_to_depth(fw.stack_warp_multi(img, flows))
        )
        # the ENCODED-flow variant must agree with the full-res-flow
        # variant: _pool_from_s2d (phase mean + pool2) == _pool(flow, 4)
        enc = common.space_to_depth(flo)  # phase-major (qy,qx,(u,v))
        got_e = np.asarray(fw.stack_warp_s2d_enc(img, enc))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got_m, want_m, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got_e, got, rtol=0, atol=1e-5)


def test_coarse_warp_grid_offset_compensation(rng):
    """A constant integer-pixel flow must warp identically at k=1/2/4
    up to pooling blur — an uncompensated coarse grid shifts the
    result by exactly (k-1)/2 px, which this catches as a first-order
    error on a smooth gradient image."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")

    h, w = 32, 48
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    img = jnp.asarray(
        np.stack([xx / w, yy / h, (xx - yy) / (h + w)], -1)[None]
    )
    flo = jnp.asarray(np.full((1, h, w, 2), 4.0, np.float32))
    full = np.asarray(fw.flow_warp(img, flo))
    for k in (2, 4):
        coarse = np.asarray(fw.flow_warp_coarse(img, flo, k))
        err = np.abs(coarse[0, 8:-8, 8:-8] - full[0, 8:-8, 8:-8]).max()
        # a (k-1)/2-px shift on the x/w ramp would be ~0.008-0.03
        assert err < 2e-3, (k, err)


def test_warp_res_resolution_order():
    """use_warp_res overrides use_half_res_warp overrides env."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    from flownet2_tf_tpu.ops import dispatch

    assert fw.stack_warp_res() == 1
    with dispatch.use_half_res_warp(True):
        assert fw.stack_warp_res() == 2
        with dispatch.use_warp_res(4):
            assert fw.stack_warp_res() == 4
        assert fw.stack_warp_res() == 2
    with dispatch.use_warp_res(1):
        with dispatch.use_half_res_warp(True):
            # explicit warp_res wins even over an inner half_res ctx
            assert fw.stack_warp_res() == 1
    import pytest
    with pytest.raises(ValueError):
        with dispatch.use_warp_res(3):
            pass


def test_warp_res_env_parse_errors_are_friendly(monkeypatch):
    """A non-numeric FLOWNET2_TPU_WARP_RES ('half', ...) must raise the
    knob's must-be-one-of message, not a bare int() ValueError — it can
    surface deep inside a jit trace via trace_signature() (ADVICE r3)."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    import pytest

    for bad in ("half", "2.0", ""):
        monkeypatch.setenv("FLOWNET2_TPU_WARP_RES", bad)
        if bad == "":
            assert fw.stack_warp_res() == 1  # empty = unset
        else:
            with pytest.raises(ValueError, match="must be one of"):
                fw.stack_warp_res()
    monkeypatch.setenv("FLOWNET2_TPU_WARP_RES", "3")
    with pytest.raises(ValueError, match="must be one of"):
        fw.stack_warp_res()


def test_s2d_encode_upsample2x_matches_resize_fold(rng):
    from flownet2_tf_tpu.models import common
    from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1

    x = jnp.asarray(rng.rand(2, 7, 9, 3).astype(np.float32))
    got = np.asarray(common.s2d_encode_upsample2x(x))
    want = np.asarray(
        common.space_to_depth(resize_bilinear_tf1(x, 14, 18))
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_channel_norm_s2d_matches_full_res(rng):
    from flownet2_tf_tpu.models import common

    x = jnp.asarray(rng.rand(2, 8, 10, 3).astype(np.float32))
    want = np.asarray(
        common.space_to_depth(common.channel_norm(x))
    )
    orig = common._CNORM_IMPL
    try:
        for impl in common._CNORM_VALID:
            common._CNORM_IMPL = impl
            got = np.asarray(
                common.channel_norm_s2d(common.space_to_depth(x))
            )
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                       err_msg=impl)
    finally:
        common._CNORM_IMPL = orig


def test_double_warp_batched_rolls_into_lax_map(rng):
    """models/stacks._double_warp_batched: above the sampling unroll
    threshold the per-sample double warp rolls into one lax.map body;
    outputs must equal independent per-sample shared-table warps."""
    from flownet2_tf_tpu.models.stacks import _double_warp_batched
    from flownet2_tf_tpu.ops.flow_warp import stack_warp_multi
    from flownet2_tf_tpu.ops.sampling import _UNROLL_MAX_SAMPLES

    n = _UNROLL_MAX_SAMPLES + 4  # force the lax.map branch
    img = jnp.asarray(rng.rand(n, 16, 16, 3).astype(np.float32))
    fa = jnp.asarray(rng.randn(n, 16, 16, 2).astype(np.float32) * 2)
    fb = jnp.asarray(rng.randn(n, 16, 16, 2).astype(np.float32) * 2)
    wa, wb = _double_warp_batched(stack_warp_multi, img, fa, fb)
    assert wa.shape == img.shape and wb.shape == img.shape
    for i in range(n):
        pair = stack_warp_multi(
            img[i : i + 1], jnp.concatenate([fa[i : i + 1],
                                             fb[i : i + 1]], axis=0)
        )
        np.testing.assert_allclose(np.asarray(wa[i]), np.asarray(pair[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(wb[i]), np.asarray(pair[1]),
                                   atol=1e-6)


def test_stack_warp_s2d_large_batch_rolls_into_lax_map(rng):
    """Above the unroll threshold the S2D stack warps take the lax.map
    body (bounded HLO at augmentation batches, r3 review #1); outputs
    must equal the unrolled path / folded full-res warp exactly."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    from flownet2_tf_tpu.models import common
    from flownet2_tf_tpu.ops.sampling import _UNROLL_MAX_SAMPLES

    n = _UNROLL_MAX_SAMPLES + 3
    img = jnp.asarray(rng.rand(n, 8, 12, 3).astype(np.float32))
    flo = jnp.asarray((rng.rand(n, 8, 12, 2) * 4 - 2).astype(np.float32))

    got = np.asarray(fw.stack_warp_s2d(img, flo))
    want = np.asarray(common.space_to_depth(fw.stack_warp(img, flo)))
    assert got.shape == (n, 4, 6, 12)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # encoded-flow variant through the same rolled branch
    flo_enc = common.space_to_depth(flo)
    got_enc = np.asarray(fw.stack_warp_s2d_enc(img, flo_enc))
    # encoded phases carry the SAME per-phase flow values the full-res
    # slicing extracts, so outputs agree exactly
    np.testing.assert_allclose(got_enc, want, rtol=0, atol=0)


def test_stack_warp_multi_s2d_rejects_batched_image(rng):
    """The multi-flow S2D warps share ONE packed table; a batched image
    must raise (the flat gather would silently warp image[0] for every
    flow — r3 review #2), matching flow_warp_multi's validation."""
    import importlib
    fw = importlib.import_module("flownet2_tf_tpu.ops.flow_warp")
    from flownet2_tf_tpu.models import common

    img = jnp.asarray(rng.rand(2, 8, 12, 3).astype(np.float32))
    flows = jnp.asarray(rng.randn(2, 8, 12, 2).astype(np.float32))
    with pytest.raises(ValueError, match="expects a \\(1, H, W, C\\)"):
        fw.stack_warp_multi_s2d(img, flows)
    with pytest.raises(ValueError, match="expects a \\(1, H, W, C\\)"):
        fw.stack_warp_multi_s2d_enc(img, common.space_to_depth(flows))


def test_explicit_bad_implementation_rejected(rng):
    """A typo'd explicit implementation= must raise, not silently fall
    through to the oracle (r3 review #3) — parity with the env/thread
    validation in ops.dispatch."""
    from flownet2_tf_tpu.ops.correlation import correlation
    from flownet2_tf_tpu.ops.flow_warp import flow_warp
    from flownet2_tf_tpu.ops import dispatch

    a = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    flo = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    with pytest.raises(ValueError, match="bad kernel implementation"):
        correlation(a, a, 1, 2, 1, 2, 2, implementation="orcale")
    with pytest.raises(ValueError, match="bad kernel implementation"):
        flow_warp(a, flo, implementation="mxU")
    with pytest.raises(ValueError, match="highest"):
        with dispatch.use_f32_features_precision("bogus"):
            pass


def test_f32_policy_layer_rejects_precast_bf16_weights(rng):
    """A param tree pre-cast under use_bf16_interconv(True) and then
    traced with the knob off must fail loudly: astype'ing the quantized
    bf16 interconv weights back to f32 would silently run degraded
    numerics on the exact path (r3 review #4)."""
    from flownet2_tf_tpu.models import common
    from flownet2_tf_tpu.ops import dispatch

    p = {
        "weights": jnp.asarray(rng.rand(3, 3, 4, 4).astype(np.float32)),
        "biases": jnp.zeros((4,), np.float32),
    }
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    with dispatch.use_bf16_interconv(True):
        p_cast = {k: (v.astype(jnp.bfloat16) if k == "weights" else v)
                  for k, v in p.items()}
        # consistent context: bf16 interconv weights are fine
        out = common.conv(p_cast, x.astype(jnp.bfloat16), act=False,
                          compute_dtype=jnp.bfloat16, interconv=True)
        assert out.dtype == jnp.bfloat16
    # knob now off -> the same tree must be rejected, not silently cast
    with pytest.raises(ValueError, match="pre-cast under a different"):
        common.conv(p_cast, x, act=False, compute_dtype=jnp.bfloat16,
                    interconv=True)
