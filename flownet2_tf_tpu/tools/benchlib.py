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


# Two-scan-length differencing has a noise floor: wall-clock jitter of the
# two calls divided by (n_big - n_small). Marginals below it are not
# resolvable and must never be published as-is (round 1 shipped a
# -2.98 ms "time"). NOISE_FLOOR_MS is conservative for the axon tunnel.
NOISE_FLOOR_MS = 0.05


def marginal_ms(fn, *args, n_small=2, n_big=12, repeats=2):
    """Marginal per-iteration device time (ms) of ``fn(*args, x)``.

    ``fn`` must accept a trailing scalar perturbation ``x`` and return a
    scalar (e.g. ``lambda a, b, x: op(a + x, b).mean()``).

    If the marginal lands below the differencing noise floor, the
    measurement is retried once with a 16x longer scan; the result is
    clamped at 0.0 (a negative marginal is pure noise, not a time).
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

    def measure(ns, nb, reps):
        run(ns)
        run(nb)  # compile both
        best = float("inf")
        for _ in range(reps):
            t_small = run(ns)
            t_big = run(nb)
            best = min(best, (t_big - t_small) / (nb - ns))
        return best * 1000.0

    ms = measure(n_small, n_big, repeats)
    if ms < NOISE_FLOOR_MS:
        # sub-noise op: amortize over a much longer scan before trusting
        # it. The 16x scan divides the differencing jitter by 16, so the
        # retried value is resolvable only down to NOISE_FLOOR_MS/16 —
        # anything below that effective floor is still noise and is
        # clamped to 0.0 rather than published as a time (ADVICE r2).
        ms = measure(n_small, n_small + 16 * (n_big - n_small), repeats)
        if ms < NOISE_FLOOR_MS / 16.0:
            ms = 0.0
    return max(ms, 0.0)


def enable_compilation_cache():
    """Persistent XLA compilation cache: repeat invocations skip the
    multi-minute FlowNet2 compile (works through remote-compile
    backends too). Override the location with
    JAX_COMPILATION_CACHE_DIR; set it empty to disable.

    Shared by ``cli.py`` and ``bench.py`` (ADVICE r2: the two copies
    had started to drift).
    """
    import os

    # default under the user's cache dir — a fixed world-writable /tmp
    # path would be shared (and plantable) across users on a multi-user
    # host, and jax deserializes executables from it on cache hits
    default = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "flownet2_tf_tpu", "jax",
    )
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass


# v5e (TPU v5 lite) headline peaks; MFU/roofline accounting keys off
# jax.devices()[0].device_kind. Sources: public TPU v5e spec sheet.
DEVICE_PEAKS = {
    # device_kind: (bf16 TFLOP/s, HBM GB/s)
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
}


def device_peaks():
    """(peak_flops_per_sec, hbm_bytes_per_sec) for device 0, or (None, None)."""
    import jax

    kind = jax.devices()[0].device_kind
    return DEVICE_PEAKS.get(kind, (None, None))


def cost_analysis(fn, *args):
    """XLA's (flops, hbm bytes accessed) estimate for one jitted call.

    Returns (flops, bytes) or (None, None) if the backend does not
    expose cost analysis. Bytes is XLA's per-op HBM-traffic estimate
    summed over the program — an analytic bound, not a measurement.
    """
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def train_step_ms(model_name="s", batch=8, height=320, width=448,
                  compute_dtype="bfloat16", iters=8, augment=False,
                  remat=False, frozen=None, stop_grad_frozen=None,
                  lr=1e-4):
    """Marginal per-step time of the full jitted DP train step.

    ``frozen``/``stop_grad_frozen``: forwarded to TrainConfig when not
    None (None keeps the model/config defaults). ``lr``: bench
    schedule's learning rate — drop it for configurations that diverge
    from random init inside the timing scan (a NaN loss fails the
    finiteness check; e.g. FlowNet2 with ALL stages unfrozen)."""
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
            "learning_rates": [lr, lr],
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
        remat=remat,
        **({} if frozen is None else {"frozen": frozen}),
        **({} if stop_grad_frozen is None
           else {"stop_grad_frozen": stop_grad_frozen}),
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
