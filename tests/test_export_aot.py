"""AOT serving export (.flowpak): jax.export roundtrip tests.

The serving analogue of the reference era's freeze_graph: one artifact
holding the compiled StableHLO forward + weights, loadable without the
model registry (tools/aot.py).
"""

import numpy as np
import jax
import pytest

from flownet2_tf_tpu.models.registry import get_model
from flownet2_tf_tpu.tools import aot


@pytest.fixture(scope="module")
def s_params():
    return get_model("s").init(jax.random.PRNGKey(0))


def test_roundtrip_matches_infer_flow(tmp_path, s_params):
    from flownet2_tf_tpu.training.infer import infer_flow

    path = tmp_path / "s.flowpak"
    meta = aot.export_serving("s", s_params, 64, 64, path,
                              compute_dtype="float32", warp_mode="full")
    assert meta["platforms"] == ["cpu"]
    sm = aot.load_serving(path)
    rng = np.random.RandomState(3)
    a = rng.rand(1, 64, 64, 3).astype(np.float32)
    b = rng.rand(1, 64, 64, 3).astype(np.float32)
    got = sm(a, b)
    ref = np.asarray(infer_flow("s", s_params, a, b,
                                compute_dtype="float32"))
    assert got.shape == (1, 64, 64, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # shape-specialized artifact must refuse other shapes loudly
    with pytest.raises(ValueError, match="specialized"):
        sm(np.zeros((1, 128, 64, 3), np.float32),
           np.zeros((1, 128, 64, 3), np.float32))


def test_half_res_warp_baked_at_export(tmp_path):
    """An artifact exported under the serving preset reproduces the
    half-res-warp forward, NOT the exact-warp forward — the dispatch
    knob is a trace-time decision frozen into the StableHLO."""
    from flownet2_tf_tpu.ops import dispatch
    from flownet2_tf_tpu.training.infer import infer_flow

    params = get_model("cs").init(jax.random.PRNGKey(1))
    path = tmp_path / "cs_half.flowpak"
    aot.export_serving("cs", params, 64, 64, path,
                       compute_dtype="float32", warp_mode="half")
    sm = aot.load_serving(path)
    rng = np.random.RandomState(4)
    a = rng.rand(1, 64, 64, 3).astype(np.float32)
    b = rng.rand(1, 64, 64, 3).astype(np.float32)
    got = sm(a, b)
    with dispatch.use_half_res_warp(True):
        ref_half = np.asarray(infer_flow("cs", params, a, b,
                                         compute_dtype="float32"))
    ref_full = np.asarray(infer_flow("cs", params, a, b,
                                     compute_dtype="float32"))
    np.testing.assert_allclose(got, ref_half, atol=1e-5)
    assert np.abs(got - ref_full).max() > 1e-4


def test_full_export_pins_exact_warps_against_env(tmp_path, monkeypatch):
    """warp_mode='full' must bake EXACT warps even when an ambient
    FLOWNET2_TPU_WARP_RES env knob is set — the durable artifact's
    metadata says 'full', so coarse warps leaking in via the env would
    be a silent mislabel (ADVICE r3; mirrors
    test_bench_warp_mode_honors_env_knobs for the export path)."""
    from flownet2_tf_tpu.training.infer import infer_flow

    params = get_model("cs").init(jax.random.PRNGKey(2))
    monkeypatch.setenv("FLOWNET2_TPU_WARP_RES", "4")
    path = tmp_path / "cs_full.flowpak"
    aot.export_serving("cs", params, 64, 64, path,
                       compute_dtype="float32", warp_mode="full")
    monkeypatch.delenv("FLOWNET2_TPU_WARP_RES")
    sm = aot.load_serving(path)
    rng = np.random.RandomState(6)
    a = rng.rand(1, 64, 64, 3).astype(np.float32)
    b = rng.rand(1, 64, 64, 3).astype(np.float32)
    got = sm(a, b)
    ref_full = np.asarray(infer_flow("cs", params, a, b,
                                     compute_dtype="float32"))
    np.testing.assert_allclose(got, ref_full, atol=1e-5)


def test_export_pins_fusion_res_against_env(tmp_path, monkeypatch):
    """Default exports must bake EXACT (full-res) fusion even when an
    ambient FLOWNET2_TPU_FUSION_RES=2 is set, and record fusion_res in
    the artifact metadata (same ADVICE-r3 failure mode as warp_res;
    uses FlowNetS — no fusion net — purely to keep the export cheap,
    plus a metadata check on the knob)."""
    params = get_model("s").init(jax.random.PRNGKey(3))
    monkeypatch.setenv("FLOWNET2_TPU_FUSION_RES", "2")
    path = tmp_path / "s_meta.flowpak"
    meta = aot.export_serving("s", params, 64, 64, path,
                              compute_dtype="float32", warp_mode="full")
    monkeypatch.delenv("FLOWNET2_TPU_FUSION_RES")
    assert meta["fusion_res"] == 1
    import json as _json
    import zipfile as _zip

    with _zip.ZipFile(path) as z:
        stored = _json.loads(z.read("meta.json"))
    assert stored["fusion_res"] == 1


def test_data_parallel_export_matches_single_device(tmp_path, s_params):
    """A data_parallel=8 artifact (params replicated, batch split over
    the ('data',) mesh) returns the same flows as the unsharded path —
    on the conftest's virtual 8-CPU mesh."""
    from flownet2_tf_tpu.training.infer import infer_flow

    path = tmp_path / "s_dp8.flowpak"
    meta = aot.export_serving("s", s_params, 64, 64, path, batch=8,
                              compute_dtype="float32", warp_mode="full",
                              data_parallel=8)
    assert meta["data_parallel"] == 8
    sm = aot.load_serving(path)
    rng = np.random.RandomState(5)
    a = rng.rand(8, 64, 64, 3).astype(np.float32)
    b = rng.rand(8, 64, 64, 3).astype(np.float32)
    got = sm(a, b)
    ref = np.asarray(infer_flow("s", s_params, a, b,
                                compute_dtype="float32"))
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # single-pair serving through a batched DP artifact: broadcast up,
    # crop back — row 0 must equal the batch-call row 0
    single = sm.infer_pair(a[0], b[0])
    np.testing.assert_allclose(single, got[0], atol=1e-6)

    with pytest.raises(ValueError, match="batch %"):
        aot.export_serving("s", s_params, 64, 64, tmp_path / "x.flowpak",
                           batch=4, data_parallel=8)


def test_infer_pair_broadcast_warns_once(monkeypatch):
    """infer_pair on a batch>1 single-chip artifact silently cost
    batch-1 redundant forwards per call (r3 review); it must warn on
    first use. A DP artifact with batch == data_parallel rides idle
    chips instead, so it stays silent."""
    import warnings

    monkeypatch.setattr(
        aot.ServingModel, "__call__",
        lambda self, a, b: np.zeros(a.shape[:3] + (2,), np.float32),
    )
    a = np.zeros((64, 64, 3), np.float32)

    sm = aot.ServingModel(None, None,
                          {"batch": 8, "height": 64, "width": 64})
    with pytest.warns(UserWarning, match="7 redundant forwards"):
        sm.infer_pair(a, a)
    with warnings.catch_warnings():  # once per artifact, not per call
        warnings.simplefilter("error")
        sm.infer_pair(a, a)

    sm_dp = aot.ServingModel.__new__(aot.ServingModel)
    sm_dp.meta = {"batch": 8, "height": 64, "width": 64,
                  "data_parallel": 8}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sm_dp.infer_pair(a, a)


def test_load_rejects_unknown_format_version(tmp_path, s_params):
    import json as _json
    import zipfile

    path = tmp_path / "s.flowpak"
    aot.export_serving("s", s_params, 64, 64, path,
                       compute_dtype="float32", warp_mode="full")
    bad = tmp_path / "bad.flowpak"
    with zipfile.ZipFile(path) as zin, \
            zipfile.ZipFile(bad, "w") as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == "meta.json":
                meta = _json.loads(data)
                meta["format_version"] = 999
                data = _json.dumps(meta)
            zout.writestr(name, data)
    with pytest.raises(ValueError, match="version"):
        aot.load_serving(bad)


def test_bf16_serving_preset_roundtrips(tmp_path, s_params):
    """The serving preset pre-casts params to bf16; numpy savez would
    round-trip them as opaque void-2. The artifact stores bf16 leaves
    as uint16 bit patterns + a manifest and must reproduce the direct
    bf16 forward exactly."""
    from flownet2_tf_tpu.models.common import cast_params_for_inference
    from flownet2_tf_tpu.training.infer import infer_flow

    path = tmp_path / "s_bf16.flowpak"
    meta = aot.export_serving("s", s_params, 64, 64, path,
                              compute_dtype="bfloat16", warp_mode="full")
    assert meta["bf16_leaves"], "serving preset should have bf16 leaves"
    sm = aot.load_serving(path)
    import jax.numpy as jnp

    got_leaf = jax.tree_util.tree_leaves(sm._params)[0]
    assert got_leaf.dtype == jnp.bfloat16
    rng = np.random.RandomState(8)
    a = rng.rand(1, 64, 64, 3).astype(np.float32)
    b = rng.rand(1, 64, 64, 3).astype(np.float32)
    got = sm(a, b)
    ref = np.asarray(infer_flow(
        "s", cast_params_for_inference(s_params), a, b,
        compute_dtype="bfloat16"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_multi_platform_export_runs_on_cpu(tmp_path):
    """platforms=['cpu','tpu'] lowers both ahead of time (no TPU needed
    at export); correlation dispatch is pinned to the platform-
    independent mxu formulation so the baked graph is identical on both
    backends. The artifact must run on the CPU side here."""
    params = get_model("c").init(jax.random.PRNGKey(2))
    path = tmp_path / "c_multi.flowpak"
    meta = aot.export_serving("c", params, 64, 64, path,
                              compute_dtype="float32", warp_mode="full",
                              platforms=["cpu", "tpu"])
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    sm = aot.load_serving(path)
    rng = np.random.RandomState(6)
    flow = sm(rng.rand(1, 64, 64, 3).astype(np.float32),
              rng.rand(1, 64, 64, 3).astype(np.float32))
    assert flow.shape == (1, 64, 64, 2) and np.isfinite(flow).all()


def test_spatial_tiles_export_matches_library_path(tmp_path, s_params):
    """A spatial_tiles=8 artifact (one H-band per device, stitched in
    the graph) must reproduce parallel.spatial.infer_flow_spatial
    exactly — same construction, frozen into StableHLO."""
    from flownet2_tf_tpu.parallel.spatial import infer_flow_spatial

    H, W, OV = 512, 64, 32
    path = tmp_path / "s_sp8.flowpak"
    meta = aot.export_serving("s", s_params, H, W, path,
                              compute_dtype="float32", warp_mode="full",
                              spatial_tiles=8, spatial_overlap=OV)
    assert meta["spatial_tiles"] == 8
    sm = aot.load_serving(path)
    rng = np.random.RandomState(9)
    a = rng.rand(H, W, 3).astype(np.float32)
    b = rng.rand(H, W, 3).astype(np.float32)
    got = sm(a[None], b[None])[0]
    ref = infer_flow_spatial("s", s_params, a, b, n_tiles=8, overlap=OV,
                             compute_dtype="float32")
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)

    with pytest.raises(ValueError, match="exclusive"):
        aot.export_serving("s", s_params, H, W, tmp_path / "x.flowpak",
                           data_parallel=2, spatial_tiles=2)


def test_export_validates_mod64(tmp_path, s_params):
    with pytest.raises(ValueError, match="multiples of 64"):
        aot.export_serving("s", s_params, 60, 64, tmp_path / "x.flowpak")


def test_cli_serve_pads_and_crops(tmp_path, s_params, capsys):
    """`serve` on a pair SMALLER than the artifact resolution: inputs
    edge-pad up on the host, flow crops back, .flo/.png written."""
    import json

    from flownet2_tf_tpu import cli
    from flownet2_tf_tpu.utils import flowlib
    from flownet2_tf_tpu.utils.image_io import write_image

    path = tmp_path / "s.flowpak"
    aot.export_serving("s", s_params, 64, 64, path,
                       compute_dtype="float32", warp_mode="full")
    rng = np.random.RandomState(7)
    a_path, b_path = tmp_path / "a.png", tmp_path / "b.png"
    write_image(rng.randint(0, 255, (48, 56, 3), np.uint8), a_path)
    write_image(rng.randint(0, 255, (48, 56, 3), np.uint8), b_path)
    out = tmp_path / "out"
    rc = cli.main([
        "serve", "--artifact", str(path), "--input_a", str(a_path),
        "--input_b", str(b_path), "--out", str(out),
    ])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["flow_shape"] == [48, 56, 2]
    flow = flowlib.read_flow(out / "a_flow.flo")
    assert flow.shape == (48, 56, 2)
    assert (out / "a_flow.png").exists()


def test_cli_export_aot(tmp_path, s_params):
    """`flownet2_tf_tpu export --aot` end-to-end from a saved npz."""
    from flownet2_tf_tpu import cli
    from flownet2_tf_tpu.training import warmstart

    ckpt = tmp_path / "weights.npz"
    np.savez(ckpt, **warmstart.flatten(jax.tree.map(np.asarray, s_params)))
    out = tmp_path / "s_cli.flowpak"
    rc = cli.main([
        "export", "--aot", "--ckpt", str(ckpt), "--out", str(out),
        "--model", "s", "--height", "64", "--width", "64",
        "--compute_dtype", "float32", "--warp_mode", "full",
    ])
    assert rc == 0
    sm = aot.load_serving(out)
    assert sm.meta["model"] == "s"
    flow = sm(np.zeros((1, 64, 64, 3), np.float32),
              np.zeros((1, 64, 64, 3), np.float32))
    assert np.isfinite(flow).all()


def test_bundle_export_dispatches_on_shape(tmp_path, s_params):
    """A bundle .flowpak holds several shape-specialized forwards with
    ONE shared weight copy; the loader dispatches per call on the input
    shape, and infer_pair picks the smallest batch-1 bucket that
    fits."""
    from flownet2_tf_tpu.training.infer import infer_flow

    path = tmp_path / "s_bundle.flowpak"
    meta = aot.export_serving_bundle(
        "s", s_params, [(64, 64, 1), (64, 128, 1), (64, 64, 2)], path,
        compute_dtype="float32", warp_mode="full",
    )
    assert meta["format_version"] == aot.BUNDLE_FORMAT_VERSION
    assert len(meta["entries"]) == 3

    sm = aot.load_serving(path)
    assert sm.shapes == [(1, 64, 64), (1, 64, 128), (2, 64, 64)]
    rng = np.random.RandomState(7)
    for shape in ((1, 64, 64, 3), (1, 64, 128, 3), (2, 64, 64, 3)):
        a = rng.rand(*shape).astype(np.float32)
        b = rng.rand(*shape).astype(np.float32)
        got = sm(a, b)
        ref = np.asarray(infer_flow("s", s_params, a, b,
                                    compute_dtype="float32"))
        assert got.shape == shape[:3] + (2,)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    # no matching entry -> loud error listing what IS available
    with pytest.raises(ValueError, match="available"):
        sm(np.zeros((1, 128, 128, 3), np.float32),
           np.zeros((1, 128, 128, 3), np.float32))

    # infer_pair: 64x100 pair -> the (1, 64, 128) bucket, cropped back
    a1 = rng.rand(64, 100, 3).astype(np.float32)
    b1 = rng.rand(64, 100, 3).astype(np.float32)
    flow = sm.infer_pair(a1, b1)
    assert flow.shape == (64, 100, 2)
    assert np.isfinite(flow).all()
    # nothing fits a taller pair
    with pytest.raises(ValueError, match="no batch-1 bundle entry"):
        sm.infer_pair(np.zeros((128, 64, 3), np.float32),
                      np.zeros((128, 64, 3), np.float32))


def test_bundle_rejects_bad_shapes(tmp_path, s_params):
    with pytest.raises(ValueError, match="multiples of 64"):
        aot.export_serving_bundle("s", s_params, [(60, 64, 1)],
                                  tmp_path / "x.flowpak")
    with pytest.raises(ValueError, match="duplicate"):
        aot.export_serving_bundle(
            "s", s_params, [(64, 64, 1), (64, 64, 1)],
            tmp_path / "x.flowpak")
    with pytest.raises(ValueError, match="at least one"):
        aot.export_serving_bundle("s", s_params, [],
                                  tmp_path / "x.flowpak")


def test_cli_export_bundle(tmp_path, s_params, capsys):
    import json as _json

    from flownet2_tf_tpu import cli
    from flownet2_tf_tpu.training import warmstart

    ckpt = tmp_path / "s.npz"
    np.savez(ckpt, **warmstart.flatten(jax.device_get(s_params)))
    out = tmp_path / "bundle.flowpak"
    rc = cli.main([
        "export", "--aot", "--model", "s", "--ckpt", str(ckpt),
        "--shapes", "64x64,64x128x2", "--compute_dtype", "float32",
        "--warp_mode", "full", "--out", str(out),
    ])
    assert rc == 0
    meta = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [tuple((e["batch"], e["height"], e["width"]))
            for e in meta["entries"]] == [(1, 64, 64), (2, 64, 128)]
    sm = aot.load_serving(out)
    a = np.random.RandomState(0).rand(2, 64, 128, 3).astype(np.float32)
    assert sm(a, a).shape == (2, 64, 128, 2)
