"""Data-layer tests: TFRecord codec, loaders, device-side augmentation."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flownet2_tf_tpu.data import augmentation, tfrecord
from flownet2_tf_tpu.data.dataset_configs import FLYING_CHAIRS_DATASET_CONFIG
from flownet2_tf_tpu.data.loader import (
    BatchLoader,
    SyntheticFlowDataset,
    TFRecordFlowDataset,
)
from flownet2_tf_tpu.ops.flow_warp import flow_warp

# quick tier (VERDICT r4 #8): kernel-parity/IO modules cheap enough to
# run on every change — `pytest -m quick` stays under 3 minutes on CPU
pytestmark = pytest.mark.quick


# ---------------------------------------------------------------------------
# TFRecord codec
# ---------------------------------------------------------------------------

def test_tfrecord_roundtrip(tmp_path, rng):
    img_a = rng.randint(0, 255, (8, 10, 3), dtype=np.uint8)
    img_b = rng.randint(0, 255, (8, 10, 3), dtype=np.uint8)
    flow = rng.randn(8, 10, 2).astype(np.float32)
    payloads = [
        tfrecord.build_example(
            {
                "image_a": img_a.tobytes(),
                "image_b": img_b.tobytes(),
                "flow": flow.tobytes(),
            }
        )
        for _ in range(3)
    ]
    path = tmp_path / "x.tfrecords"
    tfrecord.write_records(path, payloads)

    records = list(tfrecord.read_records(path))
    assert len(records) == 3
    feats = tfrecord.parse_example(records[0])
    assert set(feats) == {"image_a", "image_b", "flow"}
    np.testing.assert_array_equal(
        np.frombuffer(feats["flow"][0], np.float32).reshape(8, 10, 2), flow
    )

    ds = TFRecordFlowDataset(path, 8, 10)
    assert len(ds) == 3
    item = ds[1]
    assert item["image_a"].shape == (8, 10, 3)
    assert item["flow"].shape == (8, 10, 2)
    assert 0.0 <= item["image_a"].min() and item["image_a"].max() <= 1.0


@pytest.mark.slow
def test_tfrecord_matches_tensorflow(tmp_path, rng):
    """Our hand-rolled Example parser reads real TF-written records."""
    tf = pytest.importorskip("tensorflow")
    flow = rng.randn(4, 5, 2).astype(np.float32)
    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "image_a": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"\x01" * 60])
                ),
                "image_b": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"\x02" * 60])
                ),
                "flow": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[flow.tobytes()])
                ),
            }
        )
    )
    path = str(tmp_path / "tf.tfrecords")
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    recs = list(tfrecord.read_records(path))
    feats = tfrecord.parse_example(recs[0])
    np.testing.assert_array_equal(
        np.frombuffer(feats["flow"][0], np.float32).reshape(4, 5, 2), flow
    )
    # and TF can read ours:
    tfrecord.write_records(
        str(tmp_path / "ours.tfrecords"), [ex.SerializeToString()]
    )
    read_back = next(
        iter(tf.data.TFRecordDataset(str(tmp_path / "ours.tfrecords")))
    ).numpy()
    assert read_back == ex.SerializeToString()


# ---------------------------------------------------------------------------
# Synthetic dataset + loader
# ---------------------------------------------------------------------------

def test_synthetic_dataset_flow_consistency():
    """flow_warp(image_b, flow) must reconstruct image_a (interior)."""
    ds = SyntheticFlowDataset(size=4, height=48, width=48, seed=3,
                              max_flow=3.0)
    item = ds[2]
    warped = np.asarray(
        flow_warp(item["image_b"][None], item["flow"][None])
    )[0]
    interior = (slice(8, -8), slice(8, -8))
    err = np.abs(warped[interior] - item["image_a"][interior]).mean()
    assert err < 0.02, err


def test_synthetic_dataset_motion_regimes():
    """The fusion-study regimes (VERDICT r4 #2): 'large' translations
    land in [10, 40] px, 'subpixel' under ~1.5 px, 'mixed' alternates,
    and the exact affine inversion keeps GT consistent even at 40 px
    (flow_warp(B, flow) ~= A in the interior)."""
    h = w = 160
    for motion, lo, hi in (("large", 10.0, 65.0), ("subpixel", 0.0, 2.0)):
        ds = SyntheticFlowDataset(size=4, height=h, width=w, seed=11,
                                  motion=motion)
        for i in range(4):
            item = ds[i]
            mag = float(np.abs(item["flow"]).max())
            assert lo <= mag <= hi, (motion, i, mag)
            warped = np.asarray(
                flow_warp(item["image_b"][None], item["flow"][None])
            )[0]
            m = 48  # interior margin > max |flow|
            err = np.abs(warped[m:-m, m:-m]
                         - item["image_a"][m:-m, m:-m]).mean()
            assert err < 0.012, (motion, i, err)
    mixed = SyntheticFlowDataset(size=4, height=h, width=w, seed=11,
                                 motion="mixed")
    assert np.abs(mixed[0]["flow"]).max() >= 10.0  # even idx: large
    assert np.abs(mixed[1]["flow"]).max() <= 2.0  # odd idx: subpixel

    # 'default' rendering is pinned byte-for-byte by trained
    # checkpoints/goldens: the regime plumbing must not perturb it
    d1 = SyntheticFlowDataset(size=2, height=32, width=32, seed=5)[1]
    d2 = SyntheticFlowDataset(size=2, height=32, width=32, seed=5,
                              motion="default")[1]
    np.testing.assert_array_equal(d1["image_b"], d2["image_b"])
    np.testing.assert_array_equal(d1["flow"], d2["flow"])

    with pytest.raises(ValueError):
        SyntheticFlowDataset(motion="huge")


def test_synthetic_dataset_deterministic():
    ds = SyntheticFlowDataset(size=4, height=32, width=32, seed=1)
    a1 = ds[0]
    a2 = ds[0]
    np.testing.assert_array_equal(a1["image_a"], a2["image_a"])
    np.testing.assert_array_equal(a1["flow"], a2["flow"])


def test_batch_loader_shapes_and_epochs():
    ds = SyntheticFlowDataset(size=10, height=16, width=16)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader.batches(epochs=1))
    assert len(batches) == 2  # 10 // 4, drop remainder
    assert batches[0]["image_a"].shape == (4, 16, 16, 3)
    assert batches[0]["flow"].shape == (4, 16, 16, 2)


def test_batch_loader_shuffle_differs_across_epochs():
    ds = SyntheticFlowDataset(size=16, height=8, width=8)
    loader = BatchLoader(ds, batch_size=16, shuffle=True, num_workers=1)
    b1, b2 = list(loader.batches(epochs=2))
    assert not np.array_equal(b1["image_a"], b2["image_a"])


# ---------------------------------------------------------------------------
# Augmentation
# ---------------------------------------------------------------------------

def _identity_spec():
    return {"crop_height": 32, "crop_width": 40, "image_a": {},
            "image_b": {}}


def test_augment_identity_is_center_crop(rng):
    """Empty spec -> pure center crop, flow untouched."""
    a = rng.rand(2, 48, 64, 3).astype(np.float32)
    b = rng.rand(2, 48, 64, 3).astype(np.float32)
    f = rng.randn(2, 48, 64, 2).astype(np.float32)
    key = jax.random.PRNGKey(0)
    aug_a, aug_b, aug_f = augmentation.augment_batch(
        key, a, b, f, _identity_spec()
    )
    ca, cb, cf = augmentation.center_crop_batch(a, b, f, _identity_spec())
    np.testing.assert_allclose(np.asarray(aug_a), ca, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aug_b), cb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aug_f), cf, atol=1e-4)


def test_augment_flow_reexpression_consistency(rng):
    """THE system test: start from a consistent (A, B, flow) triple,
    augment with random spatial transforms, and check that the augmented
    flow still registers aug_b onto aug_a."""
    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset

    ds = SyntheticFlowDataset(size=2, height=96, width=96, seed=7,
                              max_flow=4.0)
    items = [ds[i] for i in range(2)]
    a = np.stack([it["image_a"] for it in items])
    b = np.stack([it["image_b"] for it in items])
    f = np.stack([it["flow"] for it in items])

    spec = {
        "crop_height": 64,
        "crop_width": 64,
        "image_a": {
            "translate": {"rand_type": "uniform_bernoulli", "exp": False,
                          "mean": 0.0, "spread": 0.05, "prob": 1.0},
            "rotate": {"rand_type": "uniform_bernoulli", "exp": False,
                       "mean": 0.0, "spread": 0.2, "prob": 1.0},
            "zoom": {"rand_type": "uniform_bernoulli", "exp": True,
                     "mean": 0.15, "spread": 0.1, "prob": 1.0},
        },
        "image_b": {
            "translate": {"rand_type": "gaussian_bernoulli", "exp": False,
                          "mean": 0.0, "spread": 0.01, "prob": 1.0},
        },
    }
    aug_a, aug_b, aug_f = augmentation.augment_batch(
        jax.random.PRNGKey(42), jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(f), spec,
    )
    rewarped = np.asarray(flow_warp(aug_b, aug_f))
    interior = (slice(None), slice(12, -12), slice(12, -12))
    err = np.abs(rewarped[interior] - np.asarray(aug_a)[interior]).mean()
    assert err < 0.03, err


def test_augment_deterministic_per_key(rng):
    a = rng.rand(1, 48, 48, 3).astype(np.float32)
    b = rng.rand(1, 48, 48, 3).astype(np.float32)
    f = rng.randn(1, 48, 48, 2).astype(np.float32)
    spec = FLYING_CHAIRS_DATASET_CONFIG["PREPROCESS"] | {
        "crop_height": 32, "crop_width": 32
    }
    key = jax.random.PRNGKey(123)
    out1 = augmentation.augment_batch(key, a, b, f, spec)
    out2 = augmentation.augment_batch(key, a, b, f, spec)
    for x, y in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    out3 = augmentation.augment_batch(jax.random.PRNGKey(124), a, b, f, spec)
    assert not np.array_equal(np.asarray(out1[0]), np.asarray(out3[0]))


def test_augment_output_ranges(rng):
    a = rng.rand(4, 64, 64, 3).astype(np.float32)
    b = rng.rand(4, 64, 64, 3).astype(np.float32)
    f = rng.randn(4, 64, 64, 2).astype(np.float32)
    spec = FLYING_CHAIRS_DATASET_CONFIG["PREPROCESS"] | {
        "crop_height": 48, "crop_width": 48
    }
    aug_a, aug_b, aug_f = augmentation.augment_batch(
        jax.random.PRNGKey(5), a, b, f, spec
    )
    for img in (aug_a, aug_b):
        arr = np.asarray(img)
        assert arr.shape == (4, 48, 48, 3)
        assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert np.isfinite(np.asarray(aug_f)).all()


def test_coeff_distributions_frozen_seed():
    """Distribution-level spec parity: uniform_bernoulli bounds, exp
    transform positivity, bernoulli drop probability."""
    spec = {"rand_type": "uniform_bernoulli", "exp": False,
            "mean": 0.1, "spread": 0.2, "prob": 0.5}
    val, is_exp = augmentation._sample_coeff(
        jax.random.PRNGKey(0), spec, 4096, 1
    )
    v = np.asarray(val).ravel()
    assert not is_exp
    nz = v[v != 0.0]
    assert nz.min() >= -0.1 - 1e-6 and nz.max() <= 0.3 + 1e-6
    drop_rate = np.mean(v == 0.0)
    assert 0.4 < drop_rate < 0.6

    spec_exp = {"rand_type": "gaussian_bernoulli", "exp": True,
                "mean": 0.0, "spread": 0.1, "prob": 1.0}
    val, is_exp = augmentation._sample_coeff(
        jax.random.PRNGKey(1), spec_exp, 4096, 1
    )
    assert is_exp
    g = np.exp(np.asarray(val).ravel())
    assert g.min() > 0
    assert abs(np.log(g).mean()) < 0.01
    assert abs(np.log(g).std() - 0.1) < 0.01


def test_affine_invert(rng):
    coeffs = {
        "translate": jnp.asarray(rng.randn(3, 2).astype(np.float32) * 0.1),
        "rotate": jnp.asarray(rng.randn(3).astype(np.float32) * 0.3),
        "zoom": jnp.asarray(1.0 + rng.rand(3).astype(np.float32) * 0.5),
        "squeeze": jnp.asarray(1.0 + rng.rand(3).astype(np.float32) * 0.2),
    }
    theta = augmentation.coeffs_to_affine(coeffs, (64, 80), (32, 40))
    inv = augmentation.invert_affine(theta)
    # compose: inv(theta(p)) == p for a probe point
    p = np.array([7.0, 11.0, 1.0], np.float32)
    q = np.asarray(theta) @ p
    q1 = np.concatenate([q, np.ones((3, 1), np.float32)], axis=1)
    back = np.einsum("bij,bj->bi", np.asarray(inv), q1)
    np.testing.assert_allclose(back, np.tile(p[:2], (3, 1)), atol=1e-4)


# ---------------------------------------------------------------------------
# Chromatic-eigen augmentation
# ---------------------------------------------------------------------------

def test_chromatic_eigen_neutral_is_identity(rng):
    img = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32)) * 0.8 + 0.1
    b = 2
    ones = jnp.ones((b,))
    zeros = jnp.zeros((b,))
    coeffs = {
        "lmult_pow": ones, "lmult_mult": ones, "lmult_add": zeros,
        "ladd_pow": ones, "ladd_mult": ones, "ladd_add": zeros,
        "sat_pow": ones, "sat_mult": ones, "sat_add": zeros,
        "col_pow": jnp.ones((b, 3)), "col_mult": jnp.ones((b, 3)),
        "col_add": jnp.zeros((b, 3)),
    }
    out = np.asarray(augmentation.apply_chromatic_eigen(img, coeffs))
    np.testing.assert_allclose(out, np.asarray(img), atol=2e-3)


def test_chromatic_eigen_sampling_and_application(rng):
    from flownet2_tf_tpu.data.dataset_configs import (
        FLYING_THINGS_3D_DATASET_CONFIG,
    )

    spec = FLYING_THINGS_3D_DATASET_CONFIG["PREPROCESS"]["image_a"]
    coeffs = augmentation.sample_chromatic_eigen_coeffs(
        jax.random.PRNGKey(0), spec, 4
    )
    assert coeffs is not None
    assert coeffs["col_mult"].shape == (4, 3)
    img = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    out = np.asarray(augmentation.apply_chromatic_eigen(img, coeffs))
    assert out.shape == (4, 16, 16, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()
    # no-spec dict -> None (chairs image_b has no chromatic entries)
    assert augmentation.sample_chromatic_eigen_coeffs(
        jax.random.PRNGKey(0), {"translate": spec["translate"]}, 4
    ) is None


def test_augment_batch_with_chromatic_spec(rng):
    from flownet2_tf_tpu.data.dataset_configs import (
        FLYING_THINGS_3D_DATASET_CONFIG,
    )

    spec = dict(FLYING_THINGS_3D_DATASET_CONFIG["PREPROCESS"])
    spec["crop_height"] = 32
    spec["crop_width"] = 32
    a = rng.rand(2, 48, 48, 3).astype(np.float32)
    b = rng.rand(2, 48, 48, 3).astype(np.float32)
    f = rng.randn(2, 48, 48, 2).astype(np.float32)
    aug_a, aug_b, aug_f = augmentation.augment_batch(
        jax.random.PRNGKey(9), a, b, f, spec
    )
    assert np.asarray(aug_a).shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(aug_a)).all()
    assert np.isfinite(np.asarray(aug_f)).all()


def test_transform_flow_pure_translation_closed_form():
    """With zero GT flow, identity A-transform and a pure B-translation
    of t pixels, the re-expressed flow must be exactly -t everywhere:
    flow'(p) = Tb^-1(Ta(p) + 0) - p = -t."""
    batch, in_hw, out_hw = 1, (64, 80), (32, 40)
    coeff_a = augmentation.identity_coeffs(batch)
    coeff_b = augmentation.identity_coeffs(batch)
    tx_px, ty_px = 6.0, -3.0
    coeff_b["translate"] = jnp.asarray(
        [[tx_px / in_hw[1], ty_px / in_hw[0]]], jnp.float32
    )
    theta_a = augmentation.coeffs_to_affine(coeff_a, in_hw, out_hw)
    theta_b = augmentation.coeffs_to_affine(coeff_b, in_hw, out_hw)
    flow = jnp.zeros((1, in_hw[0], in_hw[1], 2), jnp.float32)
    out = np.asarray(
        augmentation.transform_flow(flow, theta_a, theta_b, out_hw)
    )
    np.testing.assert_allclose(out[..., 0], -tx_px, atol=1e-4)
    np.testing.assert_allclose(out[..., 1], -ty_px, atol=1e-4)


def test_batch_loader_propagates_producer_errors():
    """A failure in the producer thread (decode error, bad shapes) must
    raise in the consumer, not masquerade as a clean end of stream that
    'completes' training at step 0 (r3 review)."""
    from flownet2_tf_tpu.data.loader import BatchLoader

    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 2:
                raise ValueError("decode failed for record 2")
            return {
                "image_a": np.zeros((8, 8, 3), np.float32),
                "image_b": np.zeros((8, 8, 3), np.float32),
                "flow": np.zeros((8, 8, 2), np.float32),
            }

    loader = BatchLoader(Boom(), batch_size=2, shuffle=False,
                         num_workers=1)
    with pytest.raises(ValueError, match="decode failed for record 2"):
        list(loader.batches(epochs=1))


def test_batch_loader_rejects_empty_stream():
    """len(dataset) < batch_size with drop_remainder must raise, not
    hang the consumer forever at epochs=None (r3 review)."""
    from flownet2_tf_tpu.data.loader import BatchLoader, SyntheticFlowDataset

    ds = SyntheticFlowDataset(size=4, height=8, width=8)
    loader = BatchLoader(ds, batch_size=8, shuffle=False, num_workers=1)
    with pytest.raises(ValueError, match="yields no batches"):
        next(loader.batches())


def _write_raw_chairs(root, n=40):
    from flownet2_tf_tpu.utils import flowlib
    from flownet2_tf_tpu.utils.image_io import write_image

    os.makedirs(root, exist_ok=True)
    r = np.random.RandomState(0)
    for i in range(n):
        stem = os.path.join(root, f"{i:05d}")
        write_image(r.randint(0, 255, (8, 8, 3)).astype(np.uint8),
                    stem + "_img1.ppm")
        write_image(r.randint(0, 255, (8, 8, 3)).astype(np.uint8),
                    stem + "_img2.ppm")
        flowlib.write_flow(r.randn(8, 8, 2).astype(np.float32),
                           stem + "_flow.flo")


def test_raw_chairs_validate_split_is_disjoint(tmp_path):
    """The raw-layout 'validate' loader must never alias the training
    set (r3 review: eval over training data silently overstated
    generalization)."""
    from flownet2_tf_tpu.data.loader import (
        FlyingChairsRawDataset, load_batch)

    root = str(tmp_path / "chairs")
    _write_raw_chairs(root, n=40)
    tr = FlyingChairsRawDataset(root, split="train")
    va = FlyingChairsRawDataset(root, split="validate")
    al = FlyingChairsRawDataset(root)
    assert set(tr.ids).isdisjoint(va.ids)
    assert sorted(tr.ids + va.ids) == al.ids
    assert len(va) == 2  # 40 / 36 holdout

    cfg = {
        "NAME": "flying_chairs",
        "RAW_ROOT": root,
        "BATCH_SIZE": 2,
        "IMAGE_HEIGHT": 8,
        "IMAGE_WIDTH": 8,
        "PATHS": {},
        "PREPROCESS": {},
    }
    loader_val, _ = load_batch(cfg, "validate")
    assert len(loader_val.dataset) == 2
    loader_tr, _ = load_batch(cfg, "train")
    assert len(loader_tr.dataset) == 38


def test_grayscale_pfm_rejected(tmp_path):
    """Single-channel 'Pf' PFM files are disparity maps, not flow; the
    flow reader must reject them at the reader, not return a 2-D array
    that violates the (H, W, 2) contract (r3 review)."""
    from flownet2_tf_tpu.utils import flowlib

    p = tmp_path / "disp.pfm"
    data = np.arange(12, dtype="<f4")
    with open(p, "wb") as f:
        f.write(b"Pf\n4 3\n-1.0\n")
        f.write(data.tobytes())
    with pytest.raises(ValueError, match="not an optical flow"):
        flowlib.read_pfm_flow(p)


def test_varint_negative_terminates():
    """_write_varint(-1) must emit proto int64 two's complement (10
    bytes), not loop forever on Python's arithmetic shift."""
    from flownet2_tf_tpu.data.tfrecord import _write_varint

    out = _write_varint(-1)
    assert out == b"\xff" * 9 + b"\x01"
    assert _write_varint(0) == b"\x00"
