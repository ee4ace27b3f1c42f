"""HBM accounting for the training memory levers: remat and grad_accum.

XLA's compile-time memory analysis (`compiled.memory_analysis()`)
reports the executable's temp allocation — the peak live-activation
buffer the scheduler actually reserved — without running a step. That
turns the DESIGN.md remat paragraph's "fits comfortably" into numbers,
and quantifies what `--grad_accum N` buys (activations bound by the
microbatch) and costs (one params-sized f32 gradient accumulator).

Rows appended to benchmarks/results.json::train_memory:
  {model}_{crop}_b{batch}[_remat][_ga{N}] -> temp/argument GiB from the
  compiled train step, plus (optionally, --time) the measured step time.

Compile-only by default, so it is safe to run through the axon relay
(first compile of the deep stacks is minutes; the persistent cache
amortizes reruns). Shapes shrink automatically on CPU smoke runs
(--smoke).

Usage: python benchmarks/memory_bench.py [--smoke] [--time]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")


def build_step(model, height, width, batch, remat, grad_accum):
    import jax

    from flownet2_tf_tpu.parallel import mesh as mesh_lib
    from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

    cfg = TrainConfig(
        model=model,
        schedule="long",
        log_dir=f"/tmp/flownet2_membench_{model}",
        compute_dtype="bfloat16",
        augment=True,
        tensorboard=False,
        checkpoint_every=0,
        remat=remat,
        grad_accum=grad_accum,
    )
    trainer = Trainer(cfg, mesh=mesh_lib.make_mesh(jax.devices()[:1]))
    state = trainer.init_state()
    rng = np.random.RandomState(0)
    batch_np = {
        "image_a": rng.randint(0, 255, (batch, height, width, 3)).astype(
            np.uint8),
        "image_b": rng.randint(0, 255, (batch, height, width, 3)).astype(
            np.uint8),
        "flow": rng.randn(batch, height, width, 2).astype(np.float32) * 2,
    }
    device_batch = mesh_lib.shard_batch(trainer.mesh, batch_np)
    preprocess = {
        "crop_height": height, "crop_width": width,
        "image_a": {"translate": {
            "rand_type": "uniform_bernoulli", "exp": False,
            "mean": 0.0, "spread": 0.02, "prob": 1.0}},
        "image_b": {},
    }
    step_fn = trainer.get_step_fn(preprocess)
    key = jax.random.PRNGKey(0)
    return step_fn, state, device_batch, key


def chained_step_ms(step_fn, state, device_batch, key, iters=6):
    """Marginal per-step time via a lax.scan step chain (the benchlib
    train_step_ms methodology). Timing individual dispatches through
    the axon relay is invalid — the r4 first cut measured 25 s per
    "step" of pure per-dispatch relay overhead for a step benchlib
    clocks at 36 ms; only the marginal of scan(n+k) - scan(n) inside
    ONE jit isolates device time (DESIGN.md "Measuring honestly")."""
    import functools
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as _np
    from jax import lax

    inner = step_fn.__wrapped__

    @functools.partial(jax.jit, static_argnums=(0,))
    def chained(n, st0, batch, k0):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = inner(st, batch, sub)
            return (st, k), metrics["loss"]

        (_, _), losses = lax.scan(
            body, (st0, k0), jnp.arange(n, dtype=jnp.float32))
        return losses.sum()

    def run(n):
        t0 = _time.perf_counter()
        v = float(chained(n, state, device_batch, key))
        assert _np.isfinite(v), f"non-finite loss in timing chain: {v}"
        return _time.perf_counter() - t0

    run(1)
    run(1 + iters)
    t1 = run(1)
    t2 = run(1 + iters)
    return (t2 - t1) / iters * 1000.0


def analyze(step_fn, state, device_batch, key):
    lowered = step_fn.lower(state, device_batch, key)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024.0 ** 3
    out = {}
    for field in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, field, None)
        if v is not None:
            out[field.replace("_size_in_bytes", "_gib")] = round(v / gib, 4)
    return compiled, out


def merge_rows(rows):
    """Merge rows into results.json::train_memory immediately — a later
    variant dying (relay stall, OOM, timeout) must not lose measured
    data (the r4 first cut wrote once at the end and lost its rows to a
    SIGTERM)."""
    try:
        with open(RESULTS) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}
    results.setdefault("train_memory", {}).update(rows)
    # indent=2 matches every other writer of results.json (ADVICE r4:
    # a lone indent=1 writer churned the whole file's formatting)
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (CPU-safe functional check)")
    ap.add_argument("--time", action="store_true",
                    help="also run + time each variant (marginal ms)")
    ap.add_argument("--models", default="css,2")
    ap.add_argument("--big", action="store_true",
                    help="also measure 448x1024 b8 and 320x448 b32 "
                         "(the regimes where remat/grad_accum matter)")
    ap.add_argument("--configs", default="",
                    help="explicit HxWxB list (e.g. '448x1024x8'), "
                         "overriding --big: the r4 all-in-one run blew "
                         "its timeout, so the r5 chain splits the sweep "
                         "into per-config invocations that each fit a "
                         "budget (VERDICT r4 #3/#5)")
    ap.add_argument("--variants", default="",
                    help="subset of base,remat,ga2,ga4,remat_ga4")
    args = ap.parse_args()

    from flownet2_tf_tpu.tools.arbiter import tpu_lock
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()

    all_variants = {
        "base": {"remat": False, "grad_accum": 1},
        "remat": {"remat": True, "grad_accum": 1},
        "ga2": {"remat": False, "grad_accum": 2},
        "ga4": {"remat": False, "grad_accum": 4},
        "remat_ga4": {"remat": True, "grad_accum": 4},
    }
    if args.smoke:
        configs = [(64, 64, 4)]
        variants = [all_variants[k] for k in ("base", "remat", "ga2")]
    else:
        if args.configs:
            configs = []
            for spec in args.configs.split(","):
                h, w, b = (int(x) for x in spec.lower().split("x"))
                configs.append((h, w, b))
        else:
            configs = [(320, 448, 8)]  # the reference training crop
            if args.big:
                # regimes where the levers should matter (VERDICT r3
                # #3): a Sintel-scale crop and a 4x batch at the crop
                configs += [(448, 1024, 8), (320, 448, 32)]
        keys = ([k.strip() for k in args.variants.split(",") if k.strip()]
                or ["base", "remat", "ga2", "ga4", "remat_ga4"])
        variants = [all_variants[k] for k in keys]

    # leave scheduler headroom under the v5e 16 GiB budget when deciding
    # whether a variant is safe to RUN (compile-time analysis is always
    # safe; running an over-budget step would hard-OOM the chip)
    run_budget_gib = 14.0

    rows = {}
    with tpu_lock(label="memory_bench"):
        for model in args.models.split(","):
            for height, width, batch in configs:
                for v in variants:
                    tag = f"{model}_{height}x{width}_b{batch}"
                    if v["remat"]:
                        tag += "_remat"
                    if v["grad_accum"] > 1:
                        tag += f"_ga{v['grad_accum']}"
                    step_fn, state, device_batch, key = build_step(
                        model, height, width, batch, v["remat"],
                        v["grad_accum"])
                    t0 = time.time()
                    compiled, mem = analyze(step_fn, state, device_batch,
                                            key)
                    mem["compile_s"] = round(time.time() - t0, 1)
                    mem.update(v)
                    if args.time:
                        total_gib = (mem.get("temp_gib", 0)
                                     + mem.get("argument_gib", 0)
                                     + mem.get("output_gib", 0))
                        if total_gib > run_budget_gib:
                            mem["ms_per_step"] = None
                            mem["run_skipped"] = (
                                f"{total_gib:.1f} GiB > {run_budget_gib} "
                                "GiB run budget"
                            )
                        else:
                            mem["ms_per_step"] = round(chained_step_ms(
                                step_fn, state, device_batch, key), 1)
                    rows[tag] = mem
                    print(json.dumps({tag: mem}), flush=True)
                    if not args.smoke:
                        merge_rows({tag: mem})

    if args.smoke:
        print("smoke run: results.json NOT updated (toy shapes, CPU)")
        return
    print(f"wrote train_memory ({len(rows)} rows) -> {RESULTS}")


if __name__ == "__main__":
    main()
