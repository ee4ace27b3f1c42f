"""Benchmark primitives that stay honest through the axon TPU tunnel.

``block_until_ready`` does not synchronize through the tunnel and bulk
device->host fetches are ~1000x slower than scalars, so all timing here
chains iterations inside one jitted ``lax.scan`` (iteration-dependent
input perturbation prevents loop-invariant hoisting), fetches a single
scalar, and differences two scan lengths to cancel per-call dispatch
overhead. On a directly-attached backend this methodology is simply a
low-noise timer.
"""

from __future__ import annotations

import functools
import time

import numpy as np


def marginal_ms(fn, *args, n_small=2, n_big=12, repeats=2):
    """Marginal per-iteration device time (ms) of ``fn(*args, x)``.

    ``fn`` must accept a trailing scalar perturbation ``x`` and return a
    scalar (e.g. ``lambda a, b, x: op(a + x, b).mean()``).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @functools.partial(jax.jit, static_argnums=(0,))
    def chained(n, *a):
        def body(_, x):
            return None, fn(*a, x)

        xs = jnp.arange(n, dtype=jnp.float32) * 1e-12
        _, ys = lax.scan(body, None, xs)
        return ys.sum()

    def run(n):
        t0 = time.perf_counter()
        v = float(chained(n, *args))
        t1 = time.perf_counter()
        assert np.isfinite(v), v
        return t1 - t0

    run(n_small)
    run(n_big)  # compile both
    best = float("inf")
    for _ in range(repeats):
        t_small = run(n_small)
        t_big = run(n_big)
        best = min(best, (t_big - t_small) / (n_big - n_small))
    return best * 1000.0


def train_step_ms(model_name="s", batch=8, height=320, width=448,
                  compute_dtype="bfloat16", iters=8, augment=False):
    """Marginal per-step time of the full jitted DP train step."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.parallel import mesh as mesh_lib
    from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

    cfg = TrainConfig(
        model=model_name,
        schedule={
            "name": "bench",
            "step_values": [10**9],
            "learning_rates": [1e-4, 1e-4],
            "momentum": 0.9,
            "momentum2": 0.999,
            "weight_decay": 4e-4,
            "max_iter": 10**9,
        },
        log_dir="/tmp/flownet2_bench_train",
        compute_dtype=compute_dtype,
        augment=augment,
        tensorboard=False,
        checkpoint_every=0,
    )
    trainer = Trainer(cfg)
    state = trainer.init_state()
    ds = SyntheticFlowDataset(size=batch, height=height, width=width)
    batch_np = {
        k: np.stack([ds[i][k] for i in range(batch)])
        for k in ("image_a", "image_b", "flow")
    }
    device_batch = mesh_lib.shard_batch(trainer.mesh, batch_np)
    step_fn_inner = trainer._build_step(None)

    # chain steps on device: feed the updated state forward
    @functools.partial(jax.jit, static_argnums=(0,))
    def chained(n, state, batch, key):
        def body(carry, x):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = step_fn_inner.__wrapped__(st, batch, sub)
            return (st, k), metrics["loss"]

        (_, _), losses = lax.scan(
            body, (state, key), jnp.arange(n, dtype=jnp.float32)
        )
        return losses.sum()

    key = jax.random.PRNGKey(0)

    def run(n):
        t0 = time.perf_counter()
        v = float(chained(n, state, device_batch, key))
        t1 = time.perf_counter()
        assert np.isfinite(v)
        return t1 - t0

    run(1)
    run(1 + iters)
    t1 = run(1)
    t2 = run(1 + iters)
    ms = (t2 - t1) / iters * 1000.0
    return ms, batch / (ms / 1000.0)
