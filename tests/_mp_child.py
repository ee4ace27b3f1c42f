"""Child process for tests/test_multiprocess.py: one member of a
2-process CPU SPMD job (Gloo collectives).

Each process provisions 2 virtual CPU devices (global mesh = 4),
initializes jax.distributed through the library's own hook
(``maybe_initialize_distributed`` — the path a real multi-host TPU pod
would take, SURVEY §2.3 comm-backend row), builds the SAME deterministic
global batch, feeds its process-local slice through
``mesh.shard_batch``, and runs two jitted DP train steps. It prints one
JSON line {loss0, loss1, epe1, psum} for the parent to compare across
processes and against the single-process 4-device run.

Run only via the parent test: needs COORDINATOR_ADDRESS / NUM_PROCESSES
/ PROCESS_ID in the environment.
"""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _configure_child():
    """2-virtual-device CPU + Gloo config for THIS process.

    Called only under ``__main__``: the parent pytest process imports
    this module for ``run_steps``/``global_batch``, and module-level
    env/config mutation would overwrite its conftest 8-device XLA_FLAGS
    and global jax config for every later test. Env vars are read at
    backend init, which main() triggers after this runs."""
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")


def global_batch(n=4, h=64, w=64, seed=123):
    """The SAME deterministic global batch on every process."""
    rng = np.random.RandomState(seed)
    return {
        "image_a": rng.rand(n, h, w, 3).astype(np.float32),
        "image_b": rng.rand(n, h, w, 3).astype(np.float32),
        "flow": (rng.rand(n, h, w, 2) * 4 - 2).astype(np.float32),
    }


def run_steps(local_batch, mesh=None, ckpt_dir=None):
    """Two DP train steps on the given (process-local) batch; returns
    the printed metrics dict. Shared with the parent's single-process
    reference run (where local == global and process_count == 1).

    ``ckpt_dir``: when set, additionally exercises the MULTI-PROCESS
    checkpoint path — orbax save with every process participating
    (process 0 writes, the rest join the barriers), then
    ``restore_or_init`` auto-resume — and reports the restored step +
    param checksum for the parent to compare."""
    import jax.numpy as jnp

    from flownet2_tf_tpu.parallel import mesh as mesh_lib
    from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

    cfg = TrainConfig(
        model="s",
        schedule={
            "name": "mp-test",
            "step_values": [100],
            "learning_rates": [1e-4, 1e-4],
            "momentum": 0.9,
            "momentum2": 0.999,
            "weight_decay": 0.0,
            "max_iter": 2,
        },
        augment=False,
        compute_dtype="float32",
        tensorboard=False,
        **({"log_dir": ckpt_dir} if ckpt_dir else {}),
    )
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step_fn = trainer.get_step_fn(None)

    device_batch = mesh_lib.shard_batch(trainer.mesh, local_batch)
    out = {}
    for i in range(2):
        state, metrics = step_fn(
            state, device_batch, jax.random.PRNGKey(100 + i)
        )
        out[f"loss{i}"] = float(jax.device_get(metrics["loss"]))
    out["epe1"] = float(jax.device_get(metrics["epe"]))
    # a parameter checksum proves the UPDATED params are identical
    # everywhere (the all-reduced gradients agreed)
    leaves = jax.tree_util.tree_leaves(state["params"])
    out["psum"] = float(
        jax.device_get(sum(jnp.abs(p).sum() for p in leaves))
    )
    if ckpt_dir:
        trainer.save(state, wait=True)
        restored, resumed = trainer.restore_or_init()
        assert resumed, "latest_step found nothing after a waited save"
        out["ckpt_step"] = int(jax.device_get(restored["step"]))
        rl = jax.tree_util.tree_leaves(restored["params"])
        out["ckpt_psum"] = float(
            jax.device_get(sum(jnp.abs(p).sum() for p in rl))
        )
    return out


def main():
    from flownet2_tf_tpu.parallel.mesh import maybe_initialize_distributed

    assert maybe_initialize_distributed(True)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    g = global_batch()
    pid = jax.process_index()
    local = {k: v[pid * 2 : (pid + 1) * 2] for k, v in g.items()}
    out = run_steps(local, ckpt_dir=os.environ.get("FLOWNET2_MP_CKPT_DIR"))
    out["process_index"] = pid
    print("MPRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    _configure_child()
    main()
