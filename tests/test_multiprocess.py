"""True multi-process SPMD training test (SURVEY §2.3 comm backend).

The reference has no distributed layer at all; this framework's
multi-host story is ``maybe_initialize_distributed`` + XLA collectives
from sharding annotations. The single-process tests exercise the
8-virtual-device mesh; THIS test exercises the real cross-process path:
2 OS processes x 2 virtual CPU devices each, Gloo collectives, the
library's own init hook and ``mesh.shard_batch``'s
process-local-shard assembly.

Asserted: both processes compute identical losses/EPE/updated params
(the gradient all-reduce crossed the process boundary), and the
2-process run matches a single-process 4-device run of the same global
batch (multi-host changes the transport, not the math).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# ~200 s of 2-process Gloo training: opt-in via RUN_SLOW=1, per the
# repo convention for long training smokes (ADVICE r3).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_mp_child.py")


def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_train_step_matches_single_process(tmp_path):
    # bounded by the subprocess communicate(timeout=540) below
    port = _free_port()
    ckpt_dir = str(tmp_path / "mp_ckpt")
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            # also exercise the multi-process orbax save/auto-resume
            # path (all processes participate; process 0 writes)
            FLOWNET2_MP_CKPT_DIR=ckpt_dir,
        )
        # drop any ambient sitecustomize that re-asserts another
        # platform; the child pins CPU itself
        env.pop("PYTHONPATH", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    results = {}
    logs = {}
    try:
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=540)
            logs[pid] = out
            assert p.returncode == 0, (
                f"child {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
            )
            line = [
                ln for ln in out.splitlines() if ln.startswith("MPRESULT ")
            ]
            assert line, out[-2000:]
            results[pid] = json.loads(line[-1][len("MPRESULT "):])
    finally:
        # a hung child (e.g. coordinator handshake never completing)
        # must not outlive the test holding its port and a core
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()

    # both processes saw the identical replicated result
    for key in ("loss0", "loss1", "epe1", "psum"):
        np.testing.assert_allclose(
            results[0][key], results[1][key], rtol=0, atol=0,
            err_msg=f"{key} diverged across processes",
        )

    # multi-process checkpointing: the waited save restored on BOTH
    # processes at the trained step with bit-identical params
    for pid in (0, 1):
        assert results[pid]["ckpt_step"] == 2, results[pid]
        np.testing.assert_allclose(
            results[pid]["ckpt_psum"], results[pid]["psum"], rtol=0,
            atol=0, err_msg="restored params differ from saved params",
        )

    # and it matches the single-process 4-device run of the SAME global
    # batch (this pytest process already has 8 virtual CPU devices from
    # conftest; use the first 4 to mirror the 2x2 global mesh)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _mp_child as child

    import jax

    from flownet2_tf_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(jax.devices()[:4])
    ref = child.run_steps(child.global_batch(), mesh=mesh)
    for key in ("loss0", "loss1", "epe1"):
        np.testing.assert_allclose(
            results[0][key], ref[key], rtol=2e-5, atol=1e-6,
            err_msg=f"{key}: 2-process vs single-process",
        )
    np.testing.assert_allclose(
        results[0]["psum"], ref["psum"], rtol=2e-5,
        err_msg="updated-param checksum: 2-process vs single-process",
    )
