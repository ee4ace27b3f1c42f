"""Device-side training augmentation — TPU-native replacement for the
reference's ``DataAugmentation`` / ``FlowAugmentation`` CUDA ops
(reference ``src/ops/preprocessing/kernels/data_augmentation.{cc,cu.cc}``,
``flow_augmentation.{cc,cu.cc}``, ``augmentation_base.{cc,h}``; consumed
from ``src/dataloader.py::load_batch``).

Everything here is pure jnp and runs *inside the jitted train step* on
device: parameter sampling with ``jax.random``, 2x3 affine composition,
bilinear resampling, the photometric chain, and the ground-truth flow
re-expression under the two (correlated but different) spatial
transforms:

    flow'(p) = T_b^{-1}( T_a(p) + flow(T_a(p)) ) - p

where T_a / T_b map output (crop) coordinates to input-image coordinates.

Parameter spec schema is the reference's Caffe-style dict (see
data/dataset_configs.py): per transform
``{'rand_type': 'uniform_bernoulli'|'gaussian_bernoulli', 'exp': bool,
'mean': mu, 'spread': sigma, 'prob': p}``. The ``image_a`` spec samples
the base transform; the ``image_b`` spec samples the incremental A->B
jitter, composed coefficient-wise (angle adds, zoom/squeeze multiply,
translation adds) exactly like the reference's correlated pair
transforms. Parity with the CUDA ops is distribution-level (SURVEY.md §7
hard part 4), verified by frozen-seed statistical tests.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

Spec = Dict[str, Any]

SPATIAL_KEYS = ("translate", "rotate", "zoom", "squeeze")
PHOTOMETRIC_KEYS = ("noise", "brightness", "gamma", "contrast", "color")


# ---------------------------------------------------------------------------
# Coefficient sampling
# ---------------------------------------------------------------------------

def _sample_coeff(key, spec: Spec | None, batch: int, n: int = 1):
    """Sample (batch, n) coefficients per the Caffe rand_type schema.

    Returns the *pre-exp* neutral value 0 when the transform is absent or
    loses its bernoulli draw; callers apply ``exp`` afterwards so the
    neutral element is 0 (additive) or 1 (multiplicative).
    """
    if spec is None:
        return jnp.zeros((batch, n), jnp.float32), False
    k_val, k_bern = jax.random.split(key)
    mean = float(spec.get("mean", 0.0))
    spread = float(spec.get("spread", 0.0))
    prob = float(spec.get("prob", 1.0))
    rand_type = spec.get("rand_type", "uniform_bernoulli")
    if rand_type == "uniform_bernoulli":
        val = jax.random.uniform(
            k_val, (batch, n), jnp.float32,
            minval=mean - spread, maxval=mean + spread,
        )
    elif rand_type == "gaussian_bernoulli":
        val = mean + spread * jax.random.normal(k_val, (batch, n), jnp.float32)
    else:
        raise ValueError(f"unknown rand_type {rand_type!r}")
    if prob < 1.0:
        keep = jax.random.bernoulli(k_bern, prob, (batch, 1))
        val = jnp.where(keep, val, 0.0)
    return val, bool(spec.get("exp", False))


def sample_spatial_coeffs(key, spec: Spec, batch: int):
    """-> dict of per-example spatial coefficients (post-exp)."""
    keys = jax.random.split(key, 4)
    out = {}
    val, is_exp = _sample_coeff(keys[0], spec.get("translate"), batch, 2)
    out["translate"] = jnp.exp(val) if is_exp else val
    val, is_exp = _sample_coeff(keys[1], spec.get("rotate"), batch, 1)
    out["rotate"] = (jnp.exp(val) if is_exp else val)[:, 0]
    # zoom/squeeze are multiplicative: neutral = 1 (exp(0) or 1+0)
    val, is_exp = _sample_coeff(keys[2], spec.get("zoom"), batch, 1)
    out["zoom"] = (jnp.exp(val) if is_exp else jnp.ones_like(val) + val)[:, 0]
    val, is_exp = _sample_coeff(keys[3], spec.get("squeeze"), batch, 1)
    out["squeeze"] = (jnp.exp(val) if is_exp else jnp.ones_like(val) + val)[:, 0]
    return out


def compose_spatial(base, delta):
    """Compose incremental B coefficients onto the base A coefficients."""
    return {
        "translate": base["translate"] + delta["translate"],
        "rotate": base["rotate"] + delta["rotate"],
        "zoom": base["zoom"] * delta["zoom"],
        "squeeze": base["squeeze"] * delta["squeeze"],
    }


def identity_coeffs(batch: int):
    return {
        "translate": jnp.zeros((batch, 2), jnp.float32),
        "rotate": jnp.zeros((batch,), jnp.float32),
        "zoom": jnp.ones((batch,), jnp.float32),
        "squeeze": jnp.ones((batch,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Affine machinery (output/crop coords -> input coords)
# ---------------------------------------------------------------------------

def coeffs_to_affine(coeffs, in_hw, out_hw):
    """Build (B, 2, 3) matrices: q = M @ (p - c_out) + c_in + t.

    Zoom > 1 magnifies (input step = 1/zoom); squeeze scales x by
    sqrt(squeeze) and y by 1/sqrt(squeeze); rotation about the crop
    center; translation in fractions of the input size.
    """
    in_h, in_w = in_hw
    out_h, out_w = out_hw
    angle = coeffs["rotate"]
    zoom_x = coeffs["zoom"] * jnp.sqrt(coeffs["squeeze"])
    zoom_y = coeffs["zoom"] / jnp.sqrt(coeffs["squeeze"])
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # M = R(angle) @ diag(1/zoom_x, 1/zoom_y)
    m00 = cos / zoom_x
    m01 = -sin / zoom_y
    m10 = sin / zoom_x
    m11 = cos / zoom_y
    tx = coeffs["translate"][:, 0] * in_w
    ty = coeffs["translate"][:, 1] * in_h
    c_in_x = (in_w - 1) / 2.0
    c_in_y = (in_h - 1) / 2.0
    c_out_x = (out_w - 1) / 2.0
    c_out_y = (out_h - 1) / 2.0
    # fold the centering into the constant column:
    # q = M p + (c_in + t - M c_out)
    bx = c_in_x + tx - (m00 * c_out_x + m01 * c_out_y)
    by = c_in_y + ty - (m10 * c_out_x + m11 * c_out_y)
    row_x = jnp.stack([m00, m01, bx], axis=-1)
    row_y = jnp.stack([m10, m11, by], axis=-1)
    return jnp.stack([row_x, row_y], axis=1)


def invert_affine(theta):
    """Invert (B, 2, 3) affines: [M | t] -> [M^-1 | -M^-1 t]."""
    m = theta[:, :, :2]
    t = theta[:, :, 2]
    det = m[:, 0, 0] * m[:, 1, 1] - m[:, 0, 1] * m[:, 1, 0]
    inv00 = m[:, 1, 1] / det
    inv01 = -m[:, 0, 1] / det
    inv10 = -m[:, 1, 0] / det
    inv11 = m[:, 0, 0] / det
    itx = -(inv00 * t[:, 0] + inv01 * t[:, 1])
    ity = -(inv10 * t[:, 0] + inv11 * t[:, 1])
    row_x = jnp.stack([inv00, inv01, itx], axis=-1)
    row_y = jnp.stack([inv10, inv11, ity], axis=-1)
    return jnp.stack([row_x, row_y], axis=1)


from flownet2_tf_tpu.ops.sampling import bilinear_gather as _bilinear_xy


def _bilinear_gather(image, x, y):
    """Sample NHWC ``image`` at per-batch float coords (B, h, w), clamped.

    Delegates to the TPU-shaped neighbor-packed sampler (ops/sampling.py).
    """
    return _bilinear_xy(image, x, y)


def _output_grid(theta, out_hw):
    out_h, out_w = out_hw
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    qx = (
        theta[:, 0, 0, None, None] * px
        + theta[:, 0, 1, None, None] * py
        + theta[:, 0, 2, None, None]
    )
    qy = (
        theta[:, 1, 0, None, None] * px
        + theta[:, 1, 1, None, None] * py
        + theta[:, 1, 2, None, None]
    )
    return qx, qy


def affine_sample(image, theta, out_hw):
    """Warp NHWC image by per-example affines into (B, out_h, out_w, C)."""
    qx, qy = _output_grid(theta, out_hw)
    return _bilinear_gather(image, qx, qy)


def transform_flow(flow, theta_a, theta_b, out_hw):
    """Re-express GT flow under transforms A and B (FlowAugmentation).

    ``flow'(p) = T_b^{-1}(T_a(p) + flow(T_a(p))) - p`` with bilinear
    sampling of the original flow at T_a(p).
    """
    qx, qy = _output_grid(theta_a, out_hw)
    f = _bilinear_gather(flow, qx, qy)  # (B, out_h, out_w, 2)
    bx = qx + f[..., 0]
    by = qy + f[..., 1]
    inv_b = invert_affine(theta_b)
    px2 = (
        inv_b[:, 0, 0, None, None] * bx
        + inv_b[:, 0, 1, None, None] * by
        + inv_b[:, 0, 2, None, None]
    )
    py2 = (
        inv_b[:, 1, 0, None, None] * bx
        + inv_b[:, 1, 1, None, None] * by
        + inv_b[:, 1, 2, None, None]
    )
    out_h, out_w = out_hw
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(out_h, dtype=jnp.float32)[None, :, None]
    return jnp.stack([px2 - xs, py2 - ys], axis=-1)


# ---------------------------------------------------------------------------
# Photometric chain
# ---------------------------------------------------------------------------

def sample_photometric_coeffs(key, spec: Spec, batch: int):
    keys = jax.random.split(key, 5)
    out = {}
    val, is_exp = _sample_coeff(keys[0], spec.get("noise"), batch, 1)
    out["noise"] = jnp.abs(jnp.exp(val) if is_exp else val)[:, 0]
    val, is_exp = _sample_coeff(keys[1], spec.get("brightness"), batch, 1)
    out["brightness"] = (jnp.exp(val) if is_exp else val)[:, 0]
    for i, name in enumerate(("gamma", "contrast")):
        val, is_exp = _sample_coeff(keys[2 + i], spec.get(name), batch, 1)
        out[name] = (jnp.exp(val) if is_exp else 1.0 + val)[:, 0]
    val, is_exp = _sample_coeff(keys[4], spec.get("color"), batch, 3)
    out["color"] = jnp.exp(val) if is_exp else 1.0 + val  # (B, 3)
    return out


# Chromatic-eigen basis (Caffe FlowNet data_augmentation layer): row 0 is
# the luminance direction, rows 1-2 span chroma. Orthonormal up to the
# precision quoted in the Caffe layer.
_EIGEN = jnp.array(
    [
        [0.51, 0.56, 0.65],
        [0.79, 0.01, -0.62],
        [0.35, -0.83, 0.44],
    ],
    jnp.float32,
)

CHROMATIC_EIGEN_KEYS = (
    "lmult_pow", "lmult_mult", "lmult_add",
    "sat_pow", "sat_mult", "sat_add",
    "col_pow", "col_mult", "col_add",
    "ladd_pow", "ladd_mult", "ladd_add",
)


def sample_chromatic_eigen_coeffs(key, spec: Spec, batch: int):
    """Sample the Caffe chromatic-eigen parameter set (None if absent)."""
    if not any(k in spec for k in CHROMATIC_EIGEN_KEYS):
        return None
    out = {}
    keys = jax.random.split(key, len(CHROMATIC_EIGEN_KEYS))
    for k, name in zip(keys, CHROMATIC_EIGEN_KEYS):
        n = 3 if name.startswith("col_") else 1
        val, is_exp = _sample_coeff(k, spec.get(name), batch, n)
        if name.endswith("_pow") or name.endswith("_mult"):
            coeff = jnp.exp(val) if is_exp else 1.0 + val
        else:  # _add: additive, neutral 0
            coeff = jnp.exp(val) - 1.0 if is_exp else val
        out[name] = coeff if n == 3 else coeff[:, 0]
    return out


def apply_chromatic_eigen(image, coeffs):
    """Luminance/saturation/color transform in the eigen color basis.

    Distribution-level parity with the reference's ChromaticEigen path
    (reference ``src/ops/preprocessing/kernels/data_augmentation.cu.cc``):
    e = E rgb; luminance channel gets pow/mult/add, chroma magnitude
    (saturation) gets pow/mult/add, per-eigen-channel color gets
    pow/mult/add; back through E^-1, clipped to [0, 1].
    """
    b = image.shape[0]
    e = jnp.einsum("nhwc,dc->nhwd", image, _EIGEN)

    def bc(x):  # (B,) or (B, 3) -> broadcastable
        return x[:, None, None, None] if x.ndim == 1 else x[:, None, None, :]

    eps = 1e-6
    # per-channel color transform (applied in eigen space)
    sign = jnp.sign(e)
    mag = jnp.abs(e)
    mag = mag ** bc(coeffs["col_pow"])
    e = sign * mag * bc(coeffs["col_mult"]) + bc(coeffs["col_add"])

    lum = e[..., :1]
    chroma = e[..., 1:]
    sat = jnp.sqrt(jnp.sum(jnp.square(chroma), axis=-1, keepdims=True) + eps)

    # two sequential luminance chains (lmult then ladd), each
    # sign-preserving pow -> mult -> add
    for prefix in ("lmult", "ladd"):
        s = jnp.sign(lum)
        lum = (
            s * jnp.abs(lum) ** bc(coeffs[f"{prefix}_pow"])
            * bc(coeffs[f"{prefix}_mult"])
            + bc(coeffs[f"{prefix}_add"])
        )

    new_sat = sat ** bc(coeffs["sat_pow"]) * bc(coeffs["sat_mult"]) + bc(
        coeffs["sat_add"]
    )
    chroma = chroma * (new_sat / sat)

    e = jnp.concatenate([lum, chroma], axis=-1)
    rgb = jnp.einsum("nhwd,cd->nhwc", e, jnp.linalg.inv(_EIGEN))
    return jnp.clip(rgb, 0.0, 1.0)


def apply_photometric(key, image, coeffs):
    """color multiplier -> gamma -> brightness -> contrast -> noise,
    clamped to [0, 1] (the CUDA op's photometric chain order)."""
    b = image.shape[0]
    img = image * coeffs["color"][:, None, None, :]
    img = jnp.clip(img, 0.0, 1.0) ** coeffs["gamma"][:, None, None, None]
    img = img + coeffs["brightness"][:, None, None, None]
    img = (img - 0.5) * coeffs["contrast"][:, None, None, None] + 0.5
    noise = jax.random.normal(key, image.shape, image.dtype)
    img = img + noise * coeffs["noise"][:, None, None, None]
    return jnp.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Top-level entry points
# ---------------------------------------------------------------------------

def _freeze(spec):
    """Make the nested spec dict hashable for jit static args."""
    return tuple(
        (k, tuple(sorted(v.items())) if isinstance(v, dict) else v)
        for k, v in sorted(spec.items())
    )


def _thaw(frozen):
    return {
        k: dict(v) if isinstance(v, tuple) else v for k, v in frozen
    }


def augment_batch(key, image_a, image_b, flow, preprocess):
    """Full training augmentation of a batch (device-side, jittable).

    ``preprocess`` is the dataset config's PREPROCESS dict. Returns
    (aug_a, aug_b, aug_flow) at (crop_height, crop_width).
    """
    crop_hw = (int(preprocess["crop_height"]), int(preprocess["crop_width"]))
    spec_a = _freeze(preprocess.get("image_a", {}))
    spec_b = _freeze(preprocess.get("image_b", {}))
    a, b, f = _augment_impl_frozen(
        key, image_a, image_b, flow, crop_hw, spec_a, spec_b
    )
    return a, b, f


@functools.partial(jax.jit, static_argnames=("crop_hw", "spec_a", "spec_b"))
def _augment_impl_frozen(key, image_a, image_b, flow, crop_hw, spec_a,
                         spec_b):
    return _augment_impl_inner(
        key, image_a, image_b, flow, crop_hw, _thaw(spec_a), _thaw(spec_b)
    )


def _augment_impl_inner(key, image_a, image_b, flow, crop_hw, spec_a,
                        spec_b):
    batch = image_a.shape[0]
    in_hw = image_a.shape[1:3]
    (k_sa, k_sb, k_pa, k_pb, k_na, k_nb, k_ce) = jax.random.split(key, 7)

    coeff_a = sample_spatial_coeffs(k_sa, spec_a, batch)
    delta_b = sample_spatial_coeffs(k_sb, spec_b, batch)
    coeff_b = compose_spatial(coeff_a, delta_b)

    theta_a = coeffs_to_affine(coeff_a, in_hw, crop_hw)
    theta_b = coeffs_to_affine(coeff_b, in_hw, crop_hw)

    aug_a = affine_sample(image_a, theta_a, crop_hw)
    aug_b = affine_sample(image_b, theta_b, crop_hw)
    aug_flow = transform_flow(flow, theta_a, theta_b, crop_hw)

    # chromatic-eigen chain (pair-correlated: same coeffs for A and B)
    ce = sample_chromatic_eigen_coeffs(k_ce, spec_a, batch)
    if ce is not None:
        aug_a = apply_chromatic_eigen(aug_a, ce)
        aug_b = apply_chromatic_eigen(aug_b, ce)

    photo_a = sample_photometric_coeffs(k_pa, spec_a, batch)
    photo_delta = sample_photometric_coeffs(k_pb, spec_b, batch)
    photo_b = {
        "noise": photo_a["noise"],
        "brightness": photo_a["brightness"] + photo_delta["brightness"],
        "gamma": photo_a["gamma"] * photo_delta["gamma"],
        "contrast": photo_a["contrast"] * photo_delta["contrast"],
        "color": photo_a["color"] * photo_delta["color"],
    }
    aug_a = apply_photometric(k_na, aug_a, photo_a)
    aug_b = apply_photometric(k_nb, aug_b, photo_b)
    return aug_a, aug_b, aug_flow


def center_crop_batch(image_a, image_b, flow, preprocess):
    """Eval-mode deterministic center crop (no augmentation)."""
    ch = int(preprocess["crop_height"])
    cw = int(preprocess["crop_width"])
    h, w = image_a.shape[1:3]
    y0 = (h - ch) // 2
    x0 = (w - cw) // 2
    sl = (slice(None), slice(y0, y0 + ch), slice(x0, x0 + cw))
    return image_a[sl], image_b[sl], flow[sl]
