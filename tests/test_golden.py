"""Golden-file regression tests (SURVEY.md §4 golden-file strategy).

The committed sample pair (data/samples/0img{0,1}.ppm + 0flow.flo)
mirrors the reference's bundled smoke pair; the golden outputs pin
FlowNetS(PRNGKey(0)) on that pair so architecture changes (padding,
layer order, scale conventions) can't land silently.
"""

import os

import numpy as np
import pytest

import jax

from flownet2_tf_tpu.models.registry import get_model
from flownet2_tf_tpu.utils import flowlib
from flownet2_tf_tpu.utils.image_io import load_image_pair

SAMPLES = os.path.join(os.path.dirname(__file__), "..", "data", "samples")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_sample_pair_is_consistent():
    """The bundled GT flow registers img1 onto img0."""
    from flownet2_tf_tpu.ops.flow_warp import flow_warp

    a, b = load_image_pair(
        os.path.join(SAMPLES, "0img0.ppm"), os.path.join(SAMPLES, "0img1.ppm")
    )
    flow = flowlib.read_flow(os.path.join(SAMPLES, "0flow.flo"))
    warped = np.asarray(flow_warp(b[None], flow[None]))[0]
    interior = (slice(16, -16), slice(16, -16))
    err = np.abs(warped[interior] - a[interior]).mean()
    assert err < 0.03, err


def test_flownet_s_golden_outputs():
    golden = np.load(os.path.join(GOLDEN, "flownet_s_seed0.npz"))
    a, b = load_image_pair(
        os.path.join(SAMPLES, "0img0.ppm"), os.path.join(SAMPLES, "0img1.ppm")
    )
    model = get_model("s")
    params = model.init(jax.random.PRNGKey(0))
    preds = model.apply(params, {"input_a": a[None], "input_b": b[None]})
    np.testing.assert_allclose(
        np.asarray(preds["flow"])[0], golden["flow"], rtol=1e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(preds["predict_flow2"])[0],
        golden["predict_flow2"],
        rtol=1e-4,
        atol=5e-4,
    )


def test_smoke_cli_on_sample_pair(tmp_path, capsys):
    """The README smoke flow: single-pair inference on the bundled pair."""
    from flownet2_tf_tpu import cli
    from flownet2_tf_tpu.training import warmstart

    params = jax.device_get(get_model("s").init(jax.random.PRNGKey(0)))
    ckpt = tmp_path / "s.npz"
    np.savez(ckpt, **warmstart.flatten(params))
    rc = cli.main([
        "test", "--model", "s", "--ckpt", str(ckpt),
        "--input_a", os.path.join(SAMPLES, "0img0.ppm"),
        "--input_b", os.path.join(SAMPLES, "0img1.ppm"),
        "--out", str(tmp_path),
    ])
    assert rc == 0
    out_flo = tmp_path / "0img0_flow.flo"
    assert out_flo.exists()
    flow = flowlib.read_flow(out_flo)
    golden = np.load(os.path.join(GOLDEN, "flownet_s_seed0.npz"))
    np.testing.assert_allclose(flow, golden["flow"], rtol=1e-4, atol=5e-4)


@pytest.mark.parametrize("name", ["c", "2"])
def test_model_zoo_goldens(name):
    """Pin FlowNetC and the full FlowNet2 stack on the sample pair."""
    golden = np.load(os.path.join(GOLDEN, f"flownet_{name}_seed0.npz"))
    a, b = load_image_pair(
        os.path.join(SAMPLES, "0img0.ppm"), os.path.join(SAMPLES, "0img1.ppm")
    )
    model = get_model(name)
    params = model.init(jax.random.PRNGKey(0))
    # jit: one fused XLA program (cached persistently) instead of a slow
    # op-by-op eager walk of the full stack on this 1-core host
    preds = jax.jit(model.apply)(
        params, {"input_a": a[None], "input_b": b[None]}
    )
    got = np.asarray(preds["flow"])[0]
    # FlowNet2 at random init amplifies through the stack; scale the
    # tolerance with golden magnitude
    scale = max(1.0, float(np.abs(golden["flow"]).mean()))
    np.testing.assert_allclose(
        got, golden["flow"], rtol=1e-3, atol=5e-3 * scale
    )
