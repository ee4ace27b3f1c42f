"""Stacked models: FlowNetCS, FlowNetCSS and the full FlowNet2 fusion.

Architecture parity:

* FlowNetCS (reference ``src/flownet_cs/flownet_cs.py``): FlowNetC under
  sub-scope ``FlowNetC`` -> full-res flow; ``warped = flow_warp(input_b,
  flow)``; ``brightness_error = channel_norm(input_a - warped)``; second
  stage is a FlowNetS (sub-scope ``FlowNetS``) on the 12-channel concat
  [input_a, input_b, warped, flow * 0.05, brightness_error]. Loss: second
  stage's multi-scale loss only (the C stage is warm-started/frozen).
* FlowNetCSS (reference ``src/flownet_css/flownet_css.py``): the same
  pattern once more on top of FlowNetCS.
* FlowNet2 (reference ``src/flownet2/flownet2.py``): CSS branch + SD
  branch on the same pair; per-branch warped image, brightness error and
  flow magnitude (channel_norm); fusion net on the 11-channel concat
  [input_a, flow_css*0.05, flow_sd*0.05, mag_css, mag_sd, err_css,
  err_sd]; fusion decoder fuse_conv0..fuse_conv2_1 ->
  predict_flow2/1/0 with fuse_deconv/fuse_interconv refinement;
  ``flow = predict_flow0 * 20`` at full resolution.

Parameter pytrees nest by stage name exactly like the reference's slim
scopes (``FlowNet2/FlowNetCSS/FlowNetCS/FlowNetC/conv1/weights``), which
makes TF1-checkpoint conversion and stage warm-starting a pure pytree-path
mapping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.models import common, flownet_c, flownet_s, flownet_sd
from flownet2_tf_tpu.models.base import FLOW_SCALE, multiscale_loss
from flownet2_tf_tpu.ops import dispatch
from flownet2_tf_tpu.ops.flow_warp import (
    _pool2,
    stack_warp,
    stack_warp_multi,
    stack_warp_multi_s2d_enc,
    stack_warp_s2d_enc,
)
from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1
from flownet2_tf_tpu.ops.sampling import _UNROLL_MAX_SAMPLES


def _double_warp_batched(warp_multi_fn, input_b, flow_a, flow_b,
                         image_s2d=None):
    """FlowNet2 fusion double warp over a batch: warp each sample's
    input_b by BOTH branch flows through one shared packed table.

    Small batches unroll per-sample Python-side (measured faster
    in-model — the gather emitter's record rate collapses on large
    operands, ops/sampling.py module docstring); above the sampling
    unroll threshold the per-sample body rolls into one ``lax.map`` so
    the HLO stays O(1) in batch size instead of 2N unrolled gather
    subgraphs (ADVICE r2).

    ``image_s2d``: optional f32 S2D form of ``input_b`` for the coarse
    warp's phase-mean pool (ops/flow_warp.py::_coarse_warp_s2d); only
    forwarded when given, so the plain (non-S2D) warp fns keep their
    signature.
    """
    n = input_b.shape[0]

    def call(img, flows, s2d):
        if s2d is None:
            return warp_multi_fn(img, flows)
        return warp_multi_fn(img, flows, image_s2d=s2d)

    if n <= _UNROLL_MAX_SAMPLES:
        a_parts, b_parts = [], []
        for i in range(n):
            pair = call(
                input_b[i : i + 1],
                jnp.concatenate(
                    [flow_a[i : i + 1], flow_b[i : i + 1]], axis=0
                ),
                None if image_s2d is None else image_s2d[i : i + 1],
            )
            a_parts.append(pair[0:1])
            b_parts.append(pair[1:2])
        return (jnp.concatenate(a_parts, axis=0),
                jnp.concatenate(b_parts, axis=0))

    if image_s2d is None:
        def body(args):
            bi, fa, fb = args
            pair = warp_multi_fn(bi[None], jnp.stack([fa, fb], axis=0))
            return pair[0], pair[1]

        return jax.lax.map(body, (input_b, flow_a, flow_b))

    def body_s2d(args):
        bi, fa, fb, s2d_i = args
        pair = warp_multi_fn(bi[None], jnp.stack([fa, fb], axis=0),
                             image_s2d=s2d_i[None])
        return pair[0], pair[1]

    return jax.lax.map(body_s2d, (input_b, flow_a, flow_b, image_s2d))


# Original channel counts of the stage-2 concat blocks
# [input_a, input_b, warped, flow*0.05, brightness_error] — the S2D
# assembly concatenates each block's OWN S2D form, and the conv1 weight
# transform splits accordingly (common.conv7x7s2_s2d in_splits).
STAGE2_S2D_SPLITS = (3, 3, 3, 2, 1)


def _stage_flow_s2d(stage_preds, in_h, in_w):
    """Full-res stage flow in S2D-encoded form ((n, h/2, w/2, 8)),
    computed WITHOUT materializing the full-res field.

    Every stage's full-res flow is ``resize4x(predict_flow2 * 20)``
    (TF1 align_corners=False), and dyadic TF1 resizes compose exactly:
    resize4x == resize2x ∘ resize2x on the piecewise-linear
    interpolant (linear interpolation at the half-way points of a PL
    function reproduces it). So the S2D fold of the full-res flow is
    ``s2d_encode_upsample2x(resize2x(predict_flow2 * 20))`` — a
    quarter-size resize plus elementwise phase averages; no full-res
    2-channel tensor, no fold transpose. Float-rounding-level
    equivalent (tests/test_models.py::test_stage_flow_s2d_matches_fold).
    """
    half = resize_bilinear_tf1(
        stage_preds["predict_flow2"] * 20.0, in_h // 2, in_w // 2
    )
    return common.s2d_encode_upsample2x(half)


def _second_stage_input_s2d(input_a, input_b, flow_s2d, compute_dtype=None):
    """S2D assembly of :func:`_second_stage_input` (r3 perf lever).

    Builds the 48-channel half-res blockwise-S2D input directly: the
    warp gather emits phase-major records (the reorder lives in the
    index values — ops/flow_warp.py::_s2d_coords_from_phases), the
    brightness error is a per-phase channel norm, the flow arrives
    already S2D-encoded (:func:`_stage_flow_s2d`), and input_a/input_b
    fold as 2x2 blocks. The full-res 12-channel concat — and the fold
    transpose the profile charged ~1 ms for — never materializes.
    Numerically equivalent to the plain path (tests/test_models.py S2D
    equivalences)."""
    a_s2d = common.space_to_depth(input_a)
    b_s2d = common.space_to_depth(input_b)
    # b_s2d doubles as the coarse-warp pool source (phase mean of the
    # shared f32 fold — r4 op-ledger win; no-op on the exact k=1 path)
    warped = stack_warp_s2d_enc(input_b, flow_s2d,
                                image_s2d=b_s2d)  # (n, h/2, w/2, 12)
    brightness_error = common.channel_norm_s2d(
        a_s2d - warped.astype(a_s2d.dtype)
    )
    dt = compute_dtype if compute_dtype is not None else input_a.dtype
    return jnp.concatenate(
        [
            a_s2d.astype(dt),
            b_s2d.astype(dt),
            warped.astype(dt),
            (flow_s2d * FLOW_SCALE).astype(dt),
            brightness_error.astype(dt),
        ],
        axis=-1,
    )


def _apply_second_stage(params_s, input_a, input_b, stage_preds, training,
                        compute_dtype):
    """Run a stacked FlowNetS stage on the warped concat, choosing the
    S2D assembly whenever the S2D conv1 head would be used (same gate:
    the two are one transform)."""
    if common.use_s2d_head7(12):
        n, h, w, _ = input_a.shape
        with jax.named_scope("stage2_assembly"):
            flow_s2d = _stage_flow_s2d(stage_preds, h, w)
            x = _second_stage_input_s2d(input_a, input_b, flow_s2d,
                                        compute_dtype)
        return flownet_s.apply(
            params_s, x, training=training, compute_dtype=compute_dtype,
            x_s2d=True, in_splits=STAGE2_S2D_SPLITS,
        )
    with jax.named_scope("stage2_assembly"):
        x = _second_stage_input(input_a, input_b, stage_preds["flow"],
                                compute_dtype)
    return flownet_s.apply(
        params_s, x, training=training, compute_dtype=compute_dtype
    )


def _second_stage_input(input_a, input_b, flow, compute_dtype=None):
    # The warp gather table stays f32 even on the bf16 perf path.
    # Measured r2 (448x1024 flat-gather, FlowNet2 scan-chained on v5e):
    # bf16 tables win ISOLATED (0.17 vs 2.1 ms per gather) but lose
    # IN-MODEL (29.4 vs 24.7 ms end-to-end) — the f32->bf16 relayout
    # XLA inserts around the packed-table build costs more than the
    # halved gather traffic saves. See ops/sampling.py gather_dtype.
    # stack_warp: full-res by default; the flag-gated half-res variant
    # cuts the issue-rate-bound gather 4x (ops/flow_warp.py).
    warped = stack_warp(input_b, flow)
    brightness_error = common.channel_norm(
        input_a - warped.astype(input_a.dtype)
    )
    dt = compute_dtype if compute_dtype is not None else input_a.dtype
    return jnp.concatenate(
        [
            input_a.astype(dt),
            input_b.astype(dt),
            warped.astype(dt),
            (flow * FLOW_SCALE).astype(dt),
            brightness_error.astype(dt),
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# FlowNetCS
# ---------------------------------------------------------------------------

def init_cs(key, dtype=jnp.float32):
    kc, ks = jax.random.split(key)
    return {
        "FlowNetC": flownet_c.init(kc, dtype=dtype),
        "FlowNetS": flownet_s.init(ks, input_channels=12, dtype=dtype),
    }


def apply_cs(params, inputs, training: bool = False, compute_dtype=None):
    # stage-level named scopes: the profiler attributes device time per
    # stage path (e.g. FlowNetC/conv3, FlowNetS_2/refine2) — op_ledger
    # by_scope
    with jax.named_scope("FlowNetC"):
        preds_c = flownet_c.apply(
            params["FlowNetC"], inputs, training=training,
            compute_dtype=compute_dtype,
        )
    with jax.named_scope("FlowNetS_2"):
        preds = _apply_second_stage(
            params["FlowNetS"], inputs["input_a"], inputs["input_b"],
            preds_c, training, compute_dtype,
        )
    preds["flow_c"] = preds_c["flow"]
    return preds


def loss_cs(flow_gt, predictions):
    return multiscale_loss(flow_gt, predictions)


# ---------------------------------------------------------------------------
# FlowNetCSS
# ---------------------------------------------------------------------------

def init_css(key, dtype=jnp.float32):
    kcs, ks = jax.random.split(key)
    return {
        "FlowNetCS": init_cs(kcs, dtype=dtype),
        "FlowNetS": flownet_s.init(ks, input_channels=12, dtype=dtype),
    }


def apply_css(params, inputs, training: bool = False, compute_dtype=None):
    with jax.named_scope("FlowNetCS"):
        preds_cs = apply_cs(
            params["FlowNetCS"], inputs, training=training,
            compute_dtype=compute_dtype,
        )
    with jax.named_scope("FlowNetS_3"):
        preds = _apply_second_stage(
            params["FlowNetS"], inputs["input_a"], inputs["input_b"],
            preds_cs, training, compute_dtype,
        )
    preds["flow_cs"] = preds_cs["flow"]
    return preds


def loss_css(flow_gt, predictions):
    return multiscale_loss(flow_gt, predictions)


# ---------------------------------------------------------------------------
# FlowNet2 (CSS + SD + fusion)
# ---------------------------------------------------------------------------

FUSION = [
    # (name, kernel, stride, out_channels, activation)
    ("fuse_conv0", 3, 1, 64, True),
    ("fuse_conv1", 3, 2, 64, True),
    ("fuse_conv1_1", 3, 1, 128, True),
    ("fuse_conv2", 3, 2, 128, True),
    ("fuse_conv2_1", 3, 1, 128, True),
]

FUSION_IN_CHANNELS = 11  # 3 + 2 + 2 + 1 + 1 + 1 + 1
# Block channel counts for the S2D fusion assembly (see
# _second_stage_input_s2d / common.conv_pair3x3_s2d in_splits):
# [input_a, flow_css*0.05, flow_sd*0.05, mag_css, mag_sd, err_css, err_sd]
FUSION_S2D_SPLITS = (3, 2, 2, 1, 1, 1, 1)


def init_flownet2(key, dtype=jnp.float32):
    kcss, ksd, kf = jax.random.split(key, 3)
    params = {
        "FlowNetCSS": init_css(kcss, dtype=dtype),
        "FlowNetSD": flownet_sd.init(ksd, dtype=dtype),
    }
    keys = iter(jax.random.split(kf, 32))
    cin = FUSION_IN_CHANNELS
    for name, k, _, cout, _ in FUSION:
        params[name] = common.conv_params(next(keys), k, cin, cout, dtype)
        cin = cout
    params["predict_flow2"] = common.conv_params(next(keys), 3, 128, 2, dtype)
    params["fuse_deconv1"] = common.deconv_params(next(keys), 128, 32, dtype=dtype)
    params["fuse_upsample_flow2to1"] = common.deconv_params(
        next(keys), 2, 2, dtype=dtype
    )
    concat1_ch = 128 + 32 + 2  # fuse_conv1_1 + fuse_deconv1 + upflow
    params["fuse_interconv1"] = common.conv_params(
        next(keys), 3, concat1_ch, 32, dtype
    )
    params["predict_flow1"] = common.conv_params(next(keys), 3, 32, 2, dtype)
    params["fuse_deconv0"] = common.deconv_params(
        next(keys), concat1_ch, 16, dtype=dtype
    )
    params["fuse_upsample_flow1to0"] = common.deconv_params(
        next(keys), 2, 2, dtype=dtype
    )
    concat0_ch = 64 + 16 + 2  # fuse_conv0 + fuse_deconv0 + upflow
    params["fuse_interconv0"] = common.conv_params(
        next(keys), 3, concat0_ch, 16, dtype
    )
    params["predict_flow0"] = common.conv_params(next(keys), 3, 16, 2, dtype)
    return params


def _fusion_input_halfres(input_a, input_b, preds_css, preds_sd, dt):
    """Half-resolution fusion input assembly (fusion_res=2 preset).

    Everything is built directly at in_h/2 x in_w/2; no full-res
    11-channel concat, full-res branch flow, warp or error field ever
    materializes:

    * images: exact 2x2 area pool (ops/flow_warp._pool2 — shares its
      lowering knob with the coarse-warp pool),
    * branch flows: ``resize2x(predict_flow2 * 20)`` — exactly the
      half-res form of each stage's full-res flow (dyadic TF1 resizes
      compose, see _stage_flow_s2d), flow VALUES stay in full-res px,
    * warps: one shared packed gather per sample at half resolution
      (displacement = u/2 in half-grid units), pinned to exact k=1 so
      the coarse-warp serving knob cannot double-pool it,
    * brightness errors / magnitudes: channel norms on the half grid.

    Known approximation beyond the octave loss: the pooled image grid
    sits at full-res 2j+0.5 while the resize-convention flow grid sits
    at 2j — a fixed quarter-pixel registration offset, second-order in
    the field smoothness. The measured AEE delta on trained weights
    (benchmarks/fusion_res_ab.py) is the adoption criterion.
    """
    n, h, w, _ = input_a.shape
    hh, hw = h // 2, w // 2
    a_h = _pool2(input_a)
    b_h = _pool2(input_b)
    f_css = resize_bilinear_tf1(
        preds_css["predict_flow2"] * 20.0, hh, hw
    )
    f_sd = resize_bilinear_tf1(preds_sd["predict_flow2"] * 20.0, hh, hw)
    with dispatch.use_warp_res(1):
        warped_css, warped_sd = _double_warp_batched(
            stack_warp_multi, b_h, f_css * 0.5, f_sd * 0.5
        )

    def feats(warped, flow):
        err = common.channel_norm(a_h - warped.astype(a_h.dtype))
        mag = common.channel_norm(flow)
        return err, mag

    err_css, mag_css = feats(warped_css, f_css)
    err_sd, mag_sd = feats(warped_sd, f_sd)
    return jnp.concatenate(
        [
            a_h.astype(dt),
            (f_css * FLOW_SCALE).astype(dt),
            (f_sd * FLOW_SCALE).astype(dt),
            mag_css.astype(dt),
            mag_sd.astype(dt),
            err_css.astype(dt),
            err_sd.astype(dt),
        ],
        axis=-1,
    )


def apply_flownet2(params, inputs, training: bool = False,
                   compute_dtype=None):
    input_a = inputs["input_a"]
    input_b = inputs["input_b"]
    n, in_h, in_w, _ = input_a.shape
    cd = compute_dtype

    with jax.named_scope("FlowNetCSS"):
        preds_css = apply_css(
            params["FlowNetCSS"], inputs, training=training,
            compute_dtype=cd
        )
    with jax.named_scope("FlowNetSD"):
        preds_sd = flownet_sd.apply(
            params["FlowNetSD"], inputs, training=training,
            compute_dtype=cd
        )
    flow_css = preds_css["flow"]
    flow_sd = preds_sd["flow"]

    # both branches warp the SAME image by different flows: build each
    # sample's packed gather table ONCE and gather it for both flows
    # (the warp gather is the profile's top cost). f32 gather tables:
    # see _second_stage_input.
    n = input_b.shape[0]
    acts = {}
    fuse_conv0_s2d = None
    fusion = FUSION
    dt = cd if cd is not None else input_a.dtype
    if dispatch.get_fusion_res() == 2:
        # serving approximation (dispatch.get_fusion_res docstring):
        # the whole fusion pyramid runs on a half-resolution input
        # assembly; predict_flow0 comes out at in_h/2 and the final
        # resize below brings it back to full resolution. The branch
        # flows are quarter-res fields anyway (resize2x of
        # predict_flow2 * 20 IS their half-res form, by the dyadic
        # composition argument in _stage_flow_s2d) — only the image
        # evidence and brightness errors lose an octave.
        x = _fusion_input_halfres(input_a, input_b, preds_css, preds_sd,
                                  dt)
    elif common.s2d_heads():
        # S2D fusion assembly (r3): the warp gathers emit phase-major
        # records, the per-branch error/magnitude norms run per phase,
        # the branch flows arrive S2D-encoded analytically
        # (_stage_flow_s2d — no full-res 2ch flow materializes), and
        # the 11-channel full-res concat never exists —
        # fuse_conv0/fuse_conv1 consume the blockwise-S2D input via
        # per-block transformed weights. Equivalent to the plain path
        # (tests/test_models.py S2D equivalences).
        flow_css_s2d = _stage_flow_s2d(preds_css, in_h, in_w)
        flow_sd_s2d = _stage_flow_s2d(preds_sd, in_h, in_w)
        # f32 fold of input_b: CSEs with the stage-2 assemblies' fold of
        # the same image; feeds the coarse warps' phase-mean pool
        b_s2d = common.space_to_depth(input_b)
        warped_css_s2d, warped_sd_s2d = _double_warp_batched(
            stack_warp_multi_s2d_enc, input_b, flow_css_s2d, flow_sd_s2d,
            image_s2d=b_s2d,
        )

        a_s2d = common.space_to_depth(input_a)

        def branch_features_s2d(warped_s2d, flow_s2d):
            err = common.channel_norm_s2d(
                a_s2d - warped_s2d.astype(a_s2d.dtype)
            )
            mag = common.channel_norm_s2d(flow_s2d)
            return err, mag

        err_css, mag_css = branch_features_s2d(warped_css_s2d, flow_css_s2d)
        err_sd, mag_sd = branch_features_s2d(warped_sd_s2d, flow_sd_s2d)
        x = jnp.concatenate(
            [
                a_s2d.astype(dt),
                (flow_css_s2d * FLOW_SCALE).astype(dt),
                (flow_sd_s2d * FLOW_SCALE).astype(dt),
                mag_css.astype(dt),
                mag_sd.astype(dt),
                err_css.astype(dt),
                err_sd.astype(dt),
            ],
            axis=-1,
        )
        x, fuse_conv0_s2d = common.conv_pair3x3_s2d(
            params["fuse_conv0"], params["fuse_conv1"], x,
            compute_dtype=cd, return_intermediate=True,
            in_splits=FUSION_S2D_SPLITS, x_is_s2d=True,
        )
        fusion = FUSION[2:]
    else:
        warped_css, warped_sd = _double_warp_batched(
            stack_warp_multi, input_b, flow_css, flow_sd
        )

        def branch_features(warped, flow):
            err = common.channel_norm(input_a - warped.astype(input_a.dtype))
            mag = common.channel_norm(flow)
            return err, mag

        err_css, mag_css = branch_features(warped_css, flow_css)
        err_sd, mag_sd = branch_features(warped_sd, flow_sd)

        x = jnp.concatenate(
            [
                input_a.astype(dt),
                (flow_css * FLOW_SCALE).astype(dt),
                (flow_sd * FLOW_SCALE).astype(dt),
                mag_css.astype(dt),
                mag_sd.astype(dt),
                err_css.astype(dt),
                err_sd.astype(dt),
            ],
            axis=-1,
        )
    with jax.named_scope("fusion"):
        preds = _fusion_head(params, x, acts, fusion, fuse_conv0_s2d, cd)

    preds["flow"] = resize_bilinear_tf1(
        preds["predict_flow0"] * 20.0, in_h, in_w
    )
    preds["flow_css"] = flow_css
    preds["flow_sd"] = flow_sd
    return preds


def _fusion_head(params, x, acts, fusion, fuse_conv0_s2d, cd):
    """Fusion pyramid + refinement (fuse_conv* -> predict_flow2/1/0).
    Factored out of apply_flownet2 so the whole chain sits under one
    profiler named scope (op_ledger by_scope)."""
    for name, _, stride, _, act in fusion:
        x = common.conv(params[name], x, stride=stride, act=act,
                        compute_dtype=cd)
        acts[name] = x

    preds = {}
    flow2 = common.predict_flow(params["predict_flow2"], x, compute_dtype=cd)
    preds["predict_flow2"] = flow2

    up_feat1 = common.deconv(params["fuse_deconv1"], x, compute_dtype=cd)
    up_flow1 = common.deconv(
        params["fuse_upsample_flow2to1"], flow2, act=False, compute_dtype=cd
    )
    concat1 = jnp.concatenate(
        [acts["fuse_conv1_1"], up_feat1,
         up_flow1.astype(acts["fuse_conv1_1"].dtype)], axis=-1
    )
    inter1 = common.conv(
        params["fuse_interconv1"], concat1, act=False, compute_dtype=cd,
        interconv=True,
    )
    flow1 = common.predict_flow(params["predict_flow1"], inter1,
                                compute_dtype=cd)
    preds["predict_flow1"] = flow1

    if fuse_conv0_s2d is not None:
        # level-0 chain entirely in S2D space: the deconvs emit
        # S2D-encoded full-res tensors at half-res shape, interconv0 /
        # predict_flow0 run as transformed 3x3 convs, and only the
        # final 2-channel flow is unfolded back to full resolution.
        up_feat0 = common.deconv_s2d(params["fuse_deconv0"], concat1,
                                     compute_dtype=cd)
        up_flow0 = common.deconv_s2d(
            params["fuse_upsample_flow1to0"], flow1, act=False,
            compute_dtype=cd,
        )
        concat0 = jnp.concatenate(
            [fuse_conv0_s2d, up_feat0.astype(fuse_conv0_s2d.dtype),
             up_flow0.astype(fuse_conv0_s2d.dtype)], axis=-1
        )
        inter0 = common.conv3x3s1_s2d(
            params["fuse_interconv0"], concat0, in_splits=(64, 16, 2),
            act=False, compute_dtype=cd, interconv=True,
        )
        flow0 = common.depth_to_space(
            common.conv3x3s1_s2d(
                params["predict_flow0"], inter0, act=False,
                compute_dtype=cd,
            )
        )
    else:
        up_feat0 = common.deconv(params["fuse_deconv0"], concat1,
                                 compute_dtype=cd)
        up_flow0 = common.deconv(
            params["fuse_upsample_flow1to0"], flow1, act=False,
            compute_dtype=cd,
        )
        concat0 = jnp.concatenate(
            [acts["fuse_conv0"], up_feat0,
             up_flow0.astype(acts["fuse_conv0"].dtype)], axis=-1
        )
        inter0 = common.conv(
            params["fuse_interconv0"], concat0, act=False, compute_dtype=cd,
            interconv=True,
        )
        flow0 = common.predict_flow(params["predict_flow0"], inter0,
                                    compute_dtype=cd)
    preds["predict_flow0"] = flow0
    return preds


# Fusion-net loss weights follow the Caffe coarse-to-fine convention on
# the three fusion scales (flow2 is the coarsest). The reference trains
# only the fusion net at this stage.
FUSION_LOSS_WEIGHTS = {
    "predict_flow2": 0.32,
    "predict_flow1": 0.08,
    "predict_flow0": 0.02,
}


def loss_flownet2(flow_gt, predictions):
    return multiscale_loss(
        flow_gt,
        {k: predictions[k] for k in FUSION_LOSS_WEIGHTS},
        weights=FUSION_LOSS_WEIGHTS,
    )
