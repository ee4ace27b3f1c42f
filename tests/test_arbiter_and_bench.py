"""Tests for the measurement-pipeline robustness layer (VERDICT r4 #1/#5):
the exclusive TPU arbiter, the bench publish gates, and the chain
manifest checker. The reference needs none of this (one process, one
GPU, no benchmarks); this project's round-4 headline was falsified by
exactly the contention these guards now refuse."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- arbiter

def _env(lockfile):
    env = dict(os.environ, FLOWNET2_TPU_LOCK_FILE=str(lockfile))
    # the lock must engage in these children even though the test
    # session itself runs on the CPU backend
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("FLOWNET2_TPU_LOCK_DEPTH", None)
    env.pop("FLOWNET2_TPU_NO_LOCK", None)
    return env


def _spawn_holder(lockfile, hold_s=30):
    p = subprocess.Popen(
        [sys.executable, "-c",
         "from flownet2_tf_tpu.tools.arbiter import tpu_lock\n"
         "import time\n"
         "with tpu_lock(label='holder'):\n"
         "    print('held', flush=True)\n"
         f"    time.sleep({hold_s})\n"],
        env=_env(lockfile), stdout=subprocess.PIPE, text=True, cwd=REPO,
    )
    assert p.stdout.readline().strip() == "held"
    return p


def test_arbiter_blocks_and_times_out(tmp_path):
    lockfile = tmp_path / "tpu.lock"
    holder = _spawn_holder(lockfile)
    try:
        # status names the holder
        out = subprocess.run(
            [sys.executable, "-m", "flownet2_tf_tpu.tools.arbiter",
             "status"],
            env=_env(lockfile), capture_output=True, text=True, cwd=REPO,
        )
        assert json.loads(out.stdout)["holder"]["label"] == "holder"
        # a second acquirer refuses to proceed (TimeoutError), loudly
        r = subprocess.run(
            [sys.executable, "-c",
             "from flownet2_tf_tpu.tools.arbiter import tpu_lock\n"
             "try:\n"
             "    with tpu_lock(label='waiter', timeout=2, poll=0.25):\n"
             "        print('ENTERED')\n"
             "except TimeoutError:\n"
             "    print('TIMEOUT_OK')\n"],
            env=_env(lockfile), capture_output=True, text=True, cwd=REPO,
        )
        assert "TIMEOUT_OK" in r.stdout, (r.stdout, r.stderr)
        assert "ENTERED" not in r.stdout
        assert "waiting for" in r.stderr  # announced who it waited on
    finally:
        holder.kill()
        holder.wait()
    # flock auto-releases on holder death: next acquire is immediate
    t0 = time.time()
    r2 = subprocess.run(
        [sys.executable, "-c",
         "from flownet2_tf_tpu.tools.arbiter import tpu_lock\n"
         "with tpu_lock(label='after', timeout=10, poll=0.25):\n"
         "    print('ACQ_OK')\n"],
        env=_env(lockfile), capture_output=True, text=True, cwd=REPO,
    )
    assert "ACQ_OK" in r2.stdout, (r2.stdout, r2.stderr)
    assert time.time() - t0 < 8


def test_arbiter_reentrant_via_env_and_disabled_paths(tmp_path):
    lockfile = tmp_path / "tpu.lock"
    holder = _spawn_holder(lockfile)
    try:
        # descendants of a holder skip acquiring (no self-deadlock)
        env = dict(_env(lockfile), FLOWNET2_TPU_LOCK_DEPTH="1")
        r = subprocess.run(
            [sys.executable, "-c",
             "from flownet2_tf_tpu.tools.arbiter import tpu_lock\n"
             "with tpu_lock(timeout=1): print('REENTRANT_OK')\n"],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        assert "REENTRANT_OK" in r.stdout
        # CPU runs skip the lock entirely
        env = dict(_env(lockfile), JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-c",
             "from flownet2_tf_tpu.tools.arbiter import tpu_lock\n"
             "with tpu_lock(timeout=1): print('CPU_SKIP_OK')\n"],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        assert "CPU_SKIP_OK" in r.stdout
    finally:
        holder.kill()
        holder.wait()


def test_arbiter_run_subcommand_serializes(tmp_path):
    """`arbiter run -- cmd` wraps a shell step in the lock."""
    lockfile = tmp_path / "tpu.lock"
    r = subprocess.run(
        [sys.executable, "-m", "flownet2_tf_tpu.tools.arbiter", "run",
         "--label", "step", "--", sys.executable, "-c", "print('RAN')"],
        env=_env(lockfile), capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0 and "RAN" in r.stdout, (r.stdout, r.stderr)


# ------------------------------------------------------------ bench gates

@pytest.mark.quick
def test_check_samples_accepts_clean_measurement():
    from flownet2_tf_tpu.tools.bench import check_samples

    median, spread, reason = check_samples(
        [0.0144, 0.0145, 0.0146, 0.0145, 0.0147], floor_ms=2.92)
    assert reason is None
    assert abs(median - 0.0145) < 1e-9
    assert spread < 0.03


@pytest.mark.quick
def test_check_samples_rejects_below_floor():
    """The exact r4 failure: 3.147 ms/pair published against a 2.92 ms
    conv floor with 7+ ms of measured non-conv work — must be refused."""
    from flownet2_tf_tpu.tools.bench import check_samples

    _, _, reason = check_samples([0.003147] * 5, floor_ms=2.92)
    assert reason is not None and "floor" in reason


@pytest.mark.quick
def test_check_samples_rejects_high_spread():
    from flownet2_tf_tpu.tools.bench import check_samples

    _, spread, reason = check_samples(
        [0.010, 0.014, 0.015, 0.015, 0.022], floor_ms=2.92)
    assert spread > 0.15
    assert reason is not None and "spread" in reason


@pytest.mark.quick
def test_check_samples_no_floor_no_gate():
    """CPU/unknown backends have no peak table: only the spread gate."""
    from flownet2_tf_tpu.tools.bench import check_samples

    _, _, reason = check_samples([0.0001] * 5, floor_ms=None)
    assert reason is None


def test_run_bench_publishes_spread_and_warp_mode():
    """The printed artifact must disclose warp_mode + spread (VERDICT
    r4 weak #5). Tiny shapes, CPU backend, validation off (host timing
    is noisy by design and that is not what this test checks)."""
    from flownet2_tf_tpu.tools.bench import run_bench

    r = run_bench(model="s", height=64, width=64, iters=2, repeats=2,
                  compute_dtype="float32", validate=False)
    assert r["warp_mode"] == "full"  # f32 => exact warps
    assert "spread_pct" in r and "repeats" in r
    assert r["ms_per_pair"] > 0


@pytest.mark.quick
def test_ledger_scope_path_parser():
    """op_ledger by_scope attribution: jaxpr name-stack strings reduce
    to the model's named_scope path (jit/scan wrappers and the trailing
    primitive stripped)."""
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        from op_ledger import _scope_path
    finally:
        sys.path.pop(0)

    assert _scope_path(
        "jit(chained)/while/body/FlowNetCSS/FlowNetCS/FlowNetC/conv3/"
        "conv_general_dilated"
    ) == "FlowNetCSS/FlowNetCS/FlowNetC/conv3"
    assert _scope_path("jit(f)/refine2/add") == "refine2"
    assert _scope_path("jit(f)/convert_element_type") == "(unscoped)"
    assert _scope_path(None) == "(unscoped)"
    assert _scope_path(
        "jit(c)/while/body/fusion/conv_general_dilated") == "fusion"


# -------------------------------------------------------------- manifest

@pytest.mark.quick
def test_manifest_lookup_paths_and_wildcards(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        import check_manifest as cm
    finally:
        sys.path.pop(0)

    results = {
        "unroll_ab": {"b8": {"unroll": 13.0}},
        "train_memory": {"css_320x448_b8": {}, "css_320x448_b8_remat": {}},
    }
    assert cm.lookup(results, "unroll_ab.b8")
    assert cm.lookup(results, "unroll_ab.b8.unroll")
    assert not cm.lookup(results, "unroll_ab.b4")
    assert cm.lookup(results, "train_memory.css_320x448*")
    assert not cm.lookup(results, "train_memory.2_448x1024*")
    assert not cm.lookup(results, "fusion_value")

    p = tmp_path / "results.json"
    p.write_text(json.dumps(results))
    monkeypatch.setattr(cm, "RESULTS", str(p))
    assert cm.main(["unroll_ab.b8", "train_memory.css*"]) == 0
    assert cm.main(["unroll_ab.b8", "missing_key"]) == 1
