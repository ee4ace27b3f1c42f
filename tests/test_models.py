"""Model-zoo tests: construction, forward shapes, loss, gradients.

Uses 64x64 (the minimum legal input: 6 stride-2 stages) to keep CPU time
sane; 384x512-shaped checks run in the inference CLI tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.models import common
from flownet2_tf_tpu.models.registry import get_model, MODEL_NAMES

H = W = 64


def make_inputs(rng, n=1, h=H, w=W):
    return {
        "input_a": jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32)),
        "input_b": jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32)),
    }


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_forward_shapes(rng, name):
    model = get_model(name)
    params = model.init(jax.random.PRNGKey(0))
    inputs = make_inputs(rng)
    preds = jax.jit(model.apply)(params, inputs)
    assert preds["flow"].shape == (1, H, W, 2)
    finest = "predict_flow0" if name == "2" else "predict_flow2"
    assert finest in preds
    if name != "2":
        # multi-scale pyramid: flow6 at /64 ... flow2 at /4
        for lvl, f in ((6, 64), (5, 32), (4, 16), (3, 8), (2, 4)):
            p = preds[f"predict_flow{lvl}"]
            assert p.shape == (1, H // f, W // f, 2), (lvl, p.shape)
    else:
        assert preds["predict_flow0"].shape == (1, H, W, 2)
        assert preds["predict_flow1"].shape == (1, H // 2, W // 2, 2)
        assert preds["predict_flow2"].shape == (1, H // 4, W // 4, 2)
        assert preds["flow_css"].shape == (1, H, W, 2)
        assert preds["flow_sd"].shape == (1, H, W, 2)


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_loss_finite_and_positive(rng, name):
    model = get_model(name)
    params = model.init(jax.random.PRNGKey(1))
    inputs = make_inputs(rng)
    flow_gt = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32) * 3)
    preds = model.apply(params, inputs)
    loss = jax.jit(model.loss)(flow_gt, preds)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_flownet_s_param_names():
    """Parameter tree keys match the reference slim scope names 1:1."""
    model = get_model("s")
    params = model.init(jax.random.PRNGKey(0))
    expected = {
        "conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
        "conv5", "conv5_1", "conv6", "conv6_1",
        "predict_flow6", "predict_flow5", "predict_flow4",
        "predict_flow3", "predict_flow2",
        "deconv5", "deconv4", "deconv3", "deconv2",
        "upsample_flow6to5", "upsample_flow5to4",
        "upsample_flow4to3", "upsample_flow3to2",
    }
    assert set(params) == expected
    assert params["conv1"]["weights"].shape == (7, 7, 6, 64)
    assert params["deconv5"]["weights"].shape == (4, 4, 1024, 512)
    assert params["predict_flow2"]["weights"].shape == (3, 3, 194, 2)


def test_flownet2_fusion_res_halfres_preset(rng):
    """dispatch.use_fusion_res(2) (VERDICT r4 #4 serving lever): the
    fusion pyramid runs at half resolution — predict_flow0 comes out at
    h/2 — while the final flow keeps full resolution; the knob is part
    of trace_signature so jit caches cannot mix the configs."""
    from flownet2_tf_tpu.ops import dispatch

    m = get_model("2")
    params = m.init(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    inputs = {"input_a": a, "input_b": b}

    full = m.apply(params, inputs)
    with dispatch.use_fusion_res(2):
        half = m.apply(params, inputs)
        sig_half = dispatch.trace_signature()
    assert half["flow"].shape == full["flow"].shape == (1, 64, 128, 2)
    assert half["predict_flow0"].shape == (1, 32, 64, 2)
    assert full["predict_flow0"].shape == (1, 64, 128, 2)
    assert np.isfinite(np.asarray(half["flow"])).all()
    # a different program, and the signature says so
    assert np.abs(np.asarray(half["flow"])
                  - np.asarray(full["flow"])).max() > 0
    assert dispatch.trace_signature() != sig_half

    with pytest.raises(ValueError):
        dispatch.use_fusion_res(3).__enter__()


def test_flownet2_param_scoping():
    """Nested pytree mirrors FlowNet2/FlowNetCSS/FlowNetCS/FlowNetC/..."""
    model = get_model("2")
    params = model.init(jax.random.PRNGKey(0))
    assert "conv1" in params["FlowNetCSS"]["FlowNetCS"]["FlowNetC"]
    assert "conv0" in params["FlowNetSD"]
    assert params["fuse_conv0"]["weights"].shape[2] == 11
    # second-stage S nets take 12-channel stacked input
    assert (
        params["FlowNetCSS"]["FlowNetS"]["conv1"]["weights"].shape[2] == 12
    )


def test_gradients_flow_through_flownet_s(rng):
    model = get_model("s")
    params = model.init(jax.random.PRNGKey(2))
    inputs = make_inputs(rng)
    flow_gt = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32))

    def loss_fn(p):
        return model.loss(flow_gt, model.apply(p, inputs))

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) >= len(norms) - 2  # nearly all touched


def test_conv_matches_caffe_padding_grid(rng):
    """Stride-2 conv uses symmetric (k-1)//2 padding (Caffe), not TF SAME.

    With a 5x5 stride-2 conv and an identity-like kernel picking the
    center tap, output[i,j] must equal input[2i, 2j].
    """
    x = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    w = np.zeros((5, 5, 1, 1), np.float32)
    w[2, 2, 0, 0] = 1.0
    p = {"weights": jnp.asarray(w), "biases": jnp.zeros((1,))}
    y = common.conv(p, x, stride=2, act=False)
    np.testing.assert_allclose(
        np.asarray(y)[0, :, :, 0], np.asarray(x)[0, ::2, ::2, 0], atol=1e-6
    )


def test_deconv_exact_2x_and_alignment(rng):
    """Deconv doubles resolution; a delta kernel reproduces Caffe pad=1."""
    x = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    w = np.zeros((4, 4, 1, 1), np.float32)
    w[1, 1, 0, 0] = 1.0  # after pad=2 cropping, this lands on even pixels
    p = {"weights": jnp.asarray(w), "biases": jnp.zeros((1,))}
    y = common.deconv(p, x, act=False)
    assert y.shape == (1, 16, 16, 1)


@pytest.mark.slow
def test_deconv_matches_tf1_conv2d_transpose(rng):
    """Lock the deconv arithmetic to TF1 conv2d_transpose(SAME, s=2, k=4)
    given the converter's kernel re-layout (mirror + transpose)."""
    tf = pytest.importorskip("tensorflow")
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    tf_w = rng.randn(4, 4, 5, 3).astype(np.float32)  # [h, w, out, in]
    want = tf.compat.v1.nn.conv2d_transpose(
        tf.constant(x),
        tf.constant(tf_w),
        output_shape=(1, 16, 16, 5),
        strides=(1, 2, 2, 1),
        padding="SAME",
    ).numpy()
    # converter layout: mirror spatially, then [h, w, out, in]->[h, w, in, out]
    jax_w = tf_w[::-1, ::-1].transpose(0, 1, 3, 2)
    p = {"weights": jnp.asarray(jax_w), "biases": jnp.zeros((5,))}
    got = np.asarray(common.deconv(p, jnp.asarray(x), act=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deconv_phase_matches_dilated(rng, monkeypatch):
    """The FLOWNET2_TPU_DECONV=phase lowering (deconv via
    _s2d_wdeconv4 + depth_to_space) computes the SAME 4 nonzero taps
    per output element as the default lhs-dilated conv; the two paths
    must agree to fp-reorder level (cited from models/common.py's
    deconv docstring). Covers bias tiling and the leaky-relu path."""
    ci, co = 6, 5
    x = jnp.asarray(rng.randn(2, 8, 12, ci).astype(np.float32))
    p = {
        "weights": jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32)),
        "biases": jnp.asarray(rng.randn(co).astype(np.float32)),
    }
    for act in (False, True):
        # pin the baseline impl BEFORE computing `want` (ADVICE r4): if
        # the suite runs under FLOWNET2_TPU_DECONV=phase, an unpinned
        # `want` would compare phase against phase — vacuous
        monkeypatch.setattr(common, "_DECONV_IMPL", "dilated")
        want = common.deconv(p, x, act=act)
        monkeypatch.setattr(common, "_DECONV_IMPL", "phase")
        got = common.deconv(p, x, act=act)
        monkeypatch.setattr(common, "_DECONV_IMPL", "dilated")
        assert got.shape == want.shape == (2, 16, 24, co)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_deconv_s2d_encoding_is_phase_major(rng):
    """deconv_s2d returns the S2D (phase-major) encoding of deconv's
    output at input resolution: space_to_depth(deconv(x)) block
    ordering (qy, qx) major over original channels."""
    ci, co = 3, 4
    x = jnp.asarray(rng.randn(1, 6, 7, ci).astype(np.float32))
    p = {
        "weights": jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32)),
        "biases": jnp.asarray(rng.randn(co).astype(np.float32)),
    }
    full = np.asarray(common.deconv(p, x, act=False))  # (1, 12, 14, co)
    enc = np.asarray(common.deconv_s2d(p, x, act=False))  # (1, 6, 7, 4co)
    want = full.reshape(1, 6, 2, 7, 2, co).transpose(0, 1, 3, 2, 4, 5)
    want = want.reshape(1, 6, 7, 4 * co)
    np.testing.assert_allclose(enc, want, rtol=1e-4, atol=1e-5)


def test_channel_norm(rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    got = np.asarray(common.channel_norm(x))
    want = np.linalg.norm(np.asarray(x), axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_channel_norm_gradient_finite_at_zero(rng):
    """The norm's gradient must be finite (zero) at exactly-zero
    pixels: unfrozen-stack training hits them (bf16 stage flows
    quantize to 0.0 -> flow magnitude / brightness error exactly zero)
    and an unguarded sqrt returned inf/NaN weight grads (measured on
    TPU at 320x448 b8 — common._safe_sqrt)."""
    x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    x = x.at[0, :2].set(0.0)  # exact-zero region

    g = jax.grad(lambda v: common.channel_norm(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_array_equal(np.asarray(g[0, :2]), 0.0)
    # nonzero pixels keep the true gradient x/||x||
    np.testing.assert_allclose(
        np.asarray(g[0, 3]),
        np.asarray(x[0, 3] / common.channel_norm(x)[0, 3]),
        rtol=1e-5,
    )

    g4 = jax.grad(
        lambda v: common.channel_norm_s2d(v).sum()
    )(jnp.zeros((1, 4, 4, 12), jnp.float32))
    assert np.isfinite(np.asarray(g4)).all()
    np.testing.assert_array_equal(np.asarray(g4), 0.0)


def test_average_endpoint_error_reference_normalization():
    """Sum over pixels, divided by batch (reference utils.py semantics)."""
    gt = jnp.zeros((2, 4, 4, 2))
    pred = jnp.ones((2, 4, 4, 2))
    # per-pixel EPE = sqrt(2); 16 pixels; batch 2 -> sum/batch = 16*sqrt(2)
    got = float(common.average_endpoint_error(gt, pred))
    np.testing.assert_allclose(got, 16 * np.sqrt(2), rtol=1e-5)


# ---------------------------------------------------------------------------
# Space-to-depth head equivalence (models/common.py S2D section)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["s", "c", "cs", "css", "sd", "2"])
def test_s2d_heads_match_plain_path(rng, name, monkeypatch):
    """The S2D perf transform must be numerically equivalent to the
    plain convs (same multiply-adds, reassociated): flows agree to
    fp-reorder level. FlowNet2 is the deep case — stage flows feed warp
    sampling, so deltas compound through the stack; its x20-scaled
    full-res flow is still well under the 1e-2 parity budget."""
    m = get_model(name)
    p = m.init(jax.random.PRNGKey(3))
    a = jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32))

    monkeypatch.setattr(common, "S2D_HEADS", True)
    monkeypatch.setattr(common, "S2D_HEAD7", "1")
    got = m.apply(p, {"input_a": a, "input_b": b})
    monkeypatch.setattr(common, "S2D_HEADS", False)
    monkeypatch.setattr(common, "S2D_HEAD7", "0")
    want = m.apply(p, {"input_a": a, "input_b": b})

    np.testing.assert_allclose(
        np.asarray(got["flow"]), np.asarray(want["flow"]),
        atol=5e-3, rtol=1e-4,
    )


def test_s2d_weight_transform_gradients(rng, monkeypatch):
    """Training runs THROUGH the trace-time weight rewrites; the
    gradient w.r.t. the original conv1 weights must match the plain
    path's (the transform is linear)."""
    monkeypatch.setattr(common, "S2D_HEADS", True)
    monkeypatch.setattr(common, "S2D_HEAD7", "1")
    m = get_model("s")
    p = m.init(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    def loss_fn(params):
        preds = m.apply(params, {"input_a": a, "input_b": b})
        return jnp.mean(jnp.square(preds["predict_flow2"]))

    g1 = jax.grad(loss_fn)(p)["conv1"]["weights"]
    monkeypatch.setattr(common, "S2D_HEADS", False)
    monkeypatch.setattr(common, "S2D_HEAD7", "0")
    g0 = jax.grad(loss_fn)(p)["conv1"]["weights"]
    assert g1.shape == g0.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), atol=1e-5, rtol=1e-3
    )


def test_s2d_dispatch_override(rng):
    """ops.dispatch.use_s2d is the supported way to force the S2D path
    on/off without monkeypatching module globals (ADVICE r2); both
    settings must produce the same flow within the S2D equivalence
    budget, and the override must beat the env defaults."""
    from flownet2_tf_tpu.ops import dispatch

    m = get_model("s")
    p = m.init(jax.random.PRNGKey(3))
    a = jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32))

    with dispatch.use_s2d(True):
        assert common.s2d_heads() is True
        assert common.use_s2d_head7(14) is True
        assert common.use_s2d_head7(6) is False  # below MIN_CIN
        got = m.apply(p, {"input_a": a, "input_b": b})
    with dispatch.use_s2d(False):
        assert common.s2d_heads() is False
        assert common.use_s2d_head7(14) is False
        want = m.apply(p, {"input_a": a, "input_b": b})
    assert dispatch.get_s2d_override() is None

    np.testing.assert_allclose(
        np.asarray(got["flow"]), np.asarray(want["flow"]),
        atol=5e-3, rtol=1e-4,
    )


def test_f32_features_precision_override():
    """dispatch.use_f32_features_precision('default') relaxes FEATURE
    convs on the f32 path (DEFAULT precision ~ bf16 operand rounding)
    while keeping outputs close; 'highest' stays the default policy
    (VERDICT r2 #9 probe infrastructure)."""
    import numpy as np

    import jax
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.ops import dispatch

    model = get_model("s")
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    inputs = {
        "input_a": jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)),
        "input_b": jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)),
    }

    flow_hi = np.asarray(model.apply(params, inputs)["flow"])
    with dispatch.use_f32_features_precision("default"):
        flow_def = np.asarray(model.apply(params, inputs)["flow"])
    with dispatch.use_f32_features_precision("highest"):
        flow_hi2 = np.asarray(model.apply(params, inputs)["flow"])

    np.testing.assert_array_equal(flow_hi, flow_hi2)  # default is highest
    # relaxed precision perturbs, but stays close on a smooth model
    assert np.abs(flow_def - flow_hi).mean() < 0.05

    with pytest.raises(ValueError):
        with dispatch.use_f32_features_precision("bogus"):
            model.apply(params, inputs)


def test_stage_flow_s2d_matches_fold(rng):
    """The analytic S2D stage flow (resize2x + phase-average encode)
    equals the fold of the materialized resize4x flow: dyadic TF1
    align_corners=False resizes compose exactly on the PL interpolant."""
    from flownet2_tf_tpu.models import stacks
    from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1

    f2 = jnp.asarray((rng.rand(2, 8, 12, 2) * 2 - 1).astype(np.float32))
    got = np.asarray(stacks._stage_flow_s2d({"predict_flow2": f2}, 32, 48))
    want = np.asarray(
        common.space_to_depth(resize_bilinear_tf1(f2 * 20.0, 32, 48))
    )
    assert got.shape == (2, 16, 24, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["s", "2"])
def test_cast_params_for_inference_bitwise(rng, name):
    """Serving-mode pre-cast params produce the BITWISE-identical bf16
    forward: every act=True conv casts weights to bf16 at trace time
    anyway (bf16(x) == bf16(bf16(x))), and the act=False f32 layers are
    left untouched by the cast."""
    m = get_model(name)
    p = m.init(jax.random.PRNGKey(1))
    pc = common.cast_params_for_inference(p)
    # flow heads / upsamplers / interconvs stay f32
    flat = jax.tree_util.tree_leaves_with_path(pc)
    for path, leaf in flat:
        names = "/".join(getattr(k, "key", str(k)) for k in path)
        if any(mk in names for mk in ("predict_flow", "upsample_flow",
                                      "interconv")):
            assert leaf.dtype == jnp.float32, names
        else:
            assert leaf.dtype == jnp.bfloat16, names
    inputs = {
        "input_a": jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32)),
        "input_b": jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32)),
    }
    got = m.apply(pc, inputs, compute_dtype=jnp.bfloat16)["flow"]
    want = m.apply(p, inputs, compute_dtype=jnp.bfloat16)["flow"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
