"""Tooling tests: xplane parser, benchlib timing primitive, tfrecords
prep tool."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_benchlib_marginal_on_cpu():
    from flownet2_tf_tpu.tools.benchlib import marginal_ms

    x = jnp.ones((256, 256), jnp.float32)
    ms = marginal_ms(lambda a, t: ((a + t) @ a).sum(), x, n_small=2,
                     n_big=6, repeats=1)
    assert np.isfinite(ms) and ms >= 0.0


def test_xplane_parser_on_synthetic_proto(tmp_path):
    """Build a minimal XSpace proto with our writer helpers and parse
    it back with the profiler's summarizer."""
    from flownet2_tf_tpu.data.tfrecord import (
        _field_header,
        _length_delimited,
        _write_varint,
    )
    from flownet2_tf_tpu.tools.profiler import summarize_xplane

    def varint_field(field, value):
        return _field_header(field, 0) + _write_varint(value)

    # XEventMetadata{id=1, name=2}
    emeta = varint_field(1, 7) + _length_delimited(2, b"my_op")
    map_entry = varint_field(1, 7) + _length_delimited(2, emeta)
    # XEvent{metadata_id=1, duration_ps=3}
    event = varint_field(1, 7) + varint_field(3, 2_000_000_000)  # 2 ms
    # XLine{name=2, events=4}
    line = _length_delimited(2, b"XLA Ops") + _length_delimited(4, event)
    # XPlane{name=2, lines=3, event_metadata=4}
    plane = (
        _length_delimited(2, b"/device:TPU:0")
        + _length_delimited(3, line)
        + _length_delimited(4, map_entry)
    )
    xspace = _length_delimited(1, plane)
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(xspace)

    summary = summarize_xplane(path)
    rows = summary["/device:TPU:0"]["XLA Ops"]
    assert rows == [(pytest.approx(2.0), 1, "my_op")]


def test_make_tfrecords_roundtrip(tmp_path, rng):
    from flownet2_tf_tpu.data.loader import (
        SyntheticFlowDataset,
        TFRecordFlowDataset,
    )
    from flownet2_tf_tpu.tools.make_tfrecords import write_dataset

    ds = SyntheticFlowDataset(size=5, height=16, width=24)
    out = tmp_path / "x.tfrecords"
    n = write_dataset(ds, out, log_every=0)
    assert n == 5
    back = TFRecordFlowDataset(out, 16, 24)
    assert len(back) == 5
    item0 = ds[0]
    got = back[0]
    # images round-trip through uint8 quantization
    np.testing.assert_allclose(
        got["image_a"], np.round(item0["image_a"] * 255) / 255, atol=1 / 254
    )
    np.testing.assert_array_equal(got["flow"], item0["flow"])

    # generator indices (no __len__) must still return the true count
    n_gen = write_dataset(
        ds, tmp_path / "y.tfrecords", indices=(i for i in (0, 2, 4)),
        log_every=0,
    )
    assert n_gen == 3
    assert len(TFRecordFlowDataset(tmp_path / "y.tfrecords", 16, 24)) == 3


def test_kitti_is_eval_only_for_training(tmp_path):
    from flownet2_tf_tpu.data.dataset_configs import get_dataset_config
    from flownet2_tf_tpu.data.loader import load_batch

    cfg = dict(get_dataset_config("kitti"))
    with pytest.raises(ValueError, match="eval-only"):
        load_batch(cfg, "train")


def test_cli_bench_on_cpu(capsys):
    from flownet2_tf_tpu import cli

    rc = cli.main([
        "bench", "--model", "s", "--height", "64", "--width", "64",
        "--iters", "2", "--compute_dtype", "float32",
    ])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["unit"] == "frame_pairs/sec/chip"
    assert out["value"] > 0


def test_bench_warp_mode_honors_env_knobs(monkeypatch):
    """`cli bench --warp_res K` plumbs through FLOWNET2_TPU_WARP_RES;
    run_bench must honor it instead of silently entering the serving
    preset's thread-local half-res override (r3 review #1)."""
    from flownet2_tf_tpu.ops.flow_warp import stack_warp_res
    from flownet2_tf_tpu.tools import bench

    seen = {}

    def fake_measure(model, h, w, b, iters, cd, repeats, warp_mode,
                     validate):
        seen["warp_mode"] = warp_mode
        seen["k"] = stack_warp_res()
        return {"value": 1.0}

    monkeypatch.setattr(bench, "_measure", fake_measure)

    monkeypatch.setenv("FLOWNET2_TPU_WARP_RES", "4")
    bench.run_bench()
    assert seen == {"warp_mode": "k4", "k": 4}

    # explicit "full" pins exact warps even with the env var set
    bench.run_bench(warp_mode="full")
    assert seen == {"warp_mode": "full", "k": 1}

    # default preset without env knobs: half-res serving warps
    monkeypatch.delenv("FLOWNET2_TPU_WARP_RES")
    bench.run_bench()
    assert seen == {"warp_mode": "half", "k": 2}
