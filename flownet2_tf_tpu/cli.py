"""Unified CLI: ``python -m flownet2_tf_tpu.cli <command>``.

Replaces the reference's per-package entry points (``python -m
src.flownet2.test --input_a ... --input_b ... --out ./``, ``python -m
src.flownet_s.train`` — reference ``src/flownet_*/train.py``/``test.py``)
with one model-/dataset-parameterized CLI (SURVEY.md §5 config row):

    train    train a model (synthetic data, FlyingChairs raw, TFRecords)
    test     single-pair inference -> .flo / flow PNG
    eval     dataset AEE evaluation (Sintel / KITTI / chairs / synthetic)
    bench    throughput benchmark on the current backend
    convert  TF1 checkpoint -> native .npz parameter tree
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common_model_arg(p):
    p.add_argument(
        "--model", default="s",
        help="model name: s, c, cs, css, sd, 2 (or flownet_* aliases)",
    )
    p.add_argument(
        "--half_res_warp", action="store_true",
        help="run stack warps at half resolution (~4x cheaper gathers; "
             "approximate — see docs/DESIGN.md for the measured AEE "
             "trade)",
    )
    p.add_argument(
        "--warp_res", default=None, type=int, choices=[1, 2, 4],
        help="stack-warp grid factor: 1 exact, 2 half (= "
             "--half_res_warp), 4 quarter (measured trade: "
             "benchmarks/results.json::warp_res_ab); overrides "
             "--half_res_warp",
    )
    p.add_argument(
        "--f32_features", default=None, choices=["highest", "default"],
        help="matmul precision for feature convs on the f32 path "
             "(default: highest — the parity setting)",
    )
    p.add_argument(
        "--fusion_res", default=None, type=int, choices=[1, 2],
        help="FlowNet2 fusion-net grid factor: 1 exact (default), 2 "
             "half resolution (approximate serving lever — measured "
             "trade: benchmarks/results.json::fusion_res_ab)",
    )


def _apply_perf_flags(args):
    """Perf knobs apply via their env defaults so every trace in the
    process (including jitted helpers) sees them."""
    import os

    if getattr(args, "half_res_warp", False):
        os.environ["FLOWNET2_TPU_HALF_RES_WARP"] = "1"
    if getattr(args, "warp_res", None):
        os.environ["FLOWNET2_TPU_WARP_RES"] = str(args.warp_res)
    if getattr(args, "f32_features", None):
        os.environ["FLOWNET2_TPU_F32_FEATURES"] = args.f32_features
    if getattr(args, "fusion_res", None):
        os.environ["FLOWNET2_TPU_FUSION_RES"] = str(args.fusion_res)


def parse_warm_start_spec(spec):
    """Parse one ``--warm_start PATH:SRC_SCOPE:DST_SCOPE`` argument.

    The two scope fields are split off the RIGHT so a PATH containing
    colons (e.g. ``gs://bucket/run``) still parses; scopes themselves
    never contain ``:``. Raises ``SystemExit`` with a usage message for
    malformed specs instead of an opaque unpack error (VERDICT r2 weak
    #4 — the README's own examples use the empty-src ``PATH::SCOPE``
    form, which must keep working).
    """
    parts = spec.rsplit(":", 2)
    if len(parts) != 3 or not parts[0]:
        raise SystemExit(
            f"--warm_start: malformed spec {spec!r}; expected "
            "PATH:SRC_SCOPE:DST_SCOPE (SRC may be empty to splice the "
            "whole checkpoint, e.g. ./logs/flownet_c::FlowNetC)"
        )
    path, src, dst = parts
    # a (path, src, dst) TUPLE, not {path: (src, dst)}: two specs may
    # splice different sub-scopes out of the SAME checkpoint, which a
    # path-keyed dict would silently collapse to the last one
    return path, src, dst


def cmd_train(args):
    from flownet2_tf_tpu.data.dataset_configs import get_dataset_config
    from flownet2_tf_tpu.data.loader import (
        BatchLoader,
        SyntheticFlowDataset,
        load_batch,
    )
    from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

    cfg = TrainConfig(
        model=args.model,
        schedule=args.schedule,
        log_dir=args.log_dir or f"./logs/flownet_{args.model}",
        seed=args.seed,
        compute_dtype=args.compute_dtype,
        augment=not args.no_augment,
        max_steps=args.max_steps,
        log_every=args.log_every,
        checkpoint_every=args.checkpoint_every,
        image_summary_every=args.image_summary_every,
        remat=args.remat,
        grad_accum=args.grad_accum,
        eval_every=args.eval_every,
        transfer_flow_dtype=args.transfer_flow_dtype,
    )
    from flownet2_tf_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed(args.multihost)
    trainer = Trainer(cfg)

    eval_loader = None
    if args.synthetic:
        ds = SyntheticFlowDataset(
            size=args.synthetic_size, height=args.synthetic_height,
            width=args.synthetic_width, seed=args.seed,
        )
        loader = BatchLoader(ds, batch_size=args.batch_size or 8)
        # crop must stay a multiple of 64 (model stride constraint)
        crop_h = max(64, args.synthetic_height // 64 * 64)
        crop_w = max(64, args.synthetic_width // 64 * 64)
        preprocess = None if args.no_augment else {
            "crop_height": crop_h,
            "crop_width": crop_w,
            "image_a": {},
            "image_b": {},
        }
        if args.eval_every:
            eval_ds = SyntheticFlowDataset(
                size=max(16, (args.batch_size or 8) * 2),
                height=args.synthetic_height, width=args.synthetic_width,
                seed=args.seed + 9999,
            )
            eval_loader = BatchLoader(
                eval_ds, batch_size=args.batch_size or 8, shuffle=False
            )
    else:
        import copy

        dataset_config = copy.deepcopy(get_dataset_config(args.dataset))
        if args.batch_size:
            dataset_config["BATCH_SIZE"] = args.batch_size
        if args.data_root:
            dataset_config["RAW_ROOT"] = args.data_root
        if args.tfrecords_train:
            dataset_config["PATHS"]["train"] = args.tfrecords_train
        if args.tfrecords_val:
            dataset_config["PATHS"]["validate"] = args.tfrecords_val
        if args.image_height:
            dataset_config["IMAGE_HEIGHT"] = args.image_height
        if args.image_width:
            dataset_config["IMAGE_WIDTH"] = args.image_width
        if args.crop_height:
            dataset_config["PREPROCESS"]["crop_height"] = args.crop_height
        if args.crop_width:
            dataset_config["PREPROCESS"]["crop_width"] = args.crop_width
        loader, preprocess = load_batch(dataset_config, "train")
        if args.eval_every:
            try:
                eval_loader, _ = load_batch(dataset_config, "validate")
            except (FileNotFoundError, ValueError) as e:
                # ValueError: raw layout with no validate split (e.g.
                # sintel) — degrade to no-eval, as for missing files
                print(f"warning: no validate split ({e}); skipping eval")

    warm = None
    if args.warm_start:
        # a LIST of (path, src, dst): two specs may name the SAME
        # checkpoint to splice different sub-scopes out of it — a dict
        # keyed by path would silently drop all but the last
        warm = [parse_warm_start_spec(spec) for spec in args.warm_start]

    trainer.fit(loader, preprocess=preprocess,
                warm_start_checkpoints=warm, eval_loader=eval_loader)
    return 0


def cmd_test(args):
    from flownet2_tf_tpu.training.infer import test_pair

    ckpt = args.ckpt
    if ckpt is None:
        # reference default-path convention
        # (./checkpoints/FlowNetX/flownet-X.ckpt-0 -> native .npz)
        from flownet2_tf_tpu.models.registry import get_model

        name = get_model(args.model).name
        ckpt = f"./checkpoints/{name}/{name.lower()}.npz"
    flow = test_pair(
        args.model,
        ckpt,
        args.input_a,
        args.input_b,
        args.out,
        save_image=not args.no_image,
        save_flo=not args.no_flo,
        compute_dtype=args.compute_dtype,
        spatial_tiles=args.spatial_tiles,
        spatial_overlap=args.spatial_overlap,
    )
    print(
        json.dumps(
            {
                "model": args.model,
                "out_dir": args.out,
                "flow_shape": list(flow.shape),
                "mean_magnitude": float(
                    (flow[..., 0] ** 2 + flow[..., 1] ** 2).mean() ** 0.5
                ),
            }
        )
    )
    return 0


def cmd_eval(args):
    from flownet2_tf_tpu.training.infer import evaluate_dataset, load_params

    dataset = _make_eval_dataset(args)
    params = load_params(args.ckpt)
    if args.save_outputs:
        aee, n = _eval_saving_outputs(args, dataset, params)
    else:
        aee = evaluate_dataset(
            args.model, params, dataset,
            compute_dtype=args.compute_dtype, limit=args.limit,
            verbose=args.verbose, batch_size=args.eval_batch,
        )
        n = min(len(dataset), args.limit or len(dataset))
    print(json.dumps({
        "model": args.model, "dataset": args.dataset,
        "pairs": n,
        "aee": aee,
        **({"outputs": args.save_outputs} if args.save_outputs else {}),
    }))
    return 0


def _eval_saving_outputs(args, dataset, params):
    """One pass that FETCHES each predicted flow (host-side masked AEE)
    and writes <dir>/NNNNNN_flow.{flo,png} + KITTI 16-bit PNGs when the
    GT carries a validity channel. Slower than the on-device AEE path
    (full flow fields cross to the host) — only for --save_outputs.

    Honors ``--eval_batch`` by batching CONSECUTIVE same-shape pairs
    (one compile per shape bucket, like evaluate_dataset) and, for
    bfloat16, pre-casts the params once so per-call weight converts
    don't pay on every pair."""
    import os

    import numpy as np

    from flownet2_tf_tpu.training.infer import infer_flow
    from flownet2_tf_tpu.utils import flowlib

    if str(args.compute_dtype) == "bfloat16":
        from flownet2_tf_tpu.models.common import cast_params_for_inference

        params = cast_params_for_inference(params)

    os.makedirs(args.save_outputs, exist_ok=True)
    n = min(len(dataset), args.limit or len(dataset))
    batch = max(1, int(args.eval_batch))
    aee_sum = 0.0
    i = 0
    pending = None  # item already fetched past a shape-bucket boundary
    while i < n:
        items = [dataset[i] if pending is None else pending]
        pending = None
        shape = items[0]["image_a"].shape
        while len(items) < batch and i + len(items) < n:
            nxt = dataset[i + len(items)]
            if nxt["image_a"].shape != shape:
                pending = nxt  # carry over; don't decode it twice
                break
            items.append(nxt)
        flows = infer_flow(
            args.model, params,
            np.stack([it["image_a"] for it in items]),
            np.stack([it["image_b"] for it in items]),
            compute_dtype=args.compute_dtype,
        )
        for j, item in enumerate(items):
            flow = flows[j]
            gt = np.asarray(item["flow"], np.float32)
            if gt.shape[-1] == 3:  # KITTI [u, v, valid]
                valid = gt[..., 2]
                gt = gt[..., :2]
            else:
                valid = np.ones(gt.shape[:2], np.float32)
            epe = np.sqrt(((flow - gt) ** 2).sum(-1)) * valid
            aee = float(epe.sum()) / max(float(valid.sum()), 1.0)
            aee_sum += aee
            stem = os.path.join(args.save_outputs, f"{i + j:06d}_flow")
            flowlib.write_flow(flow, stem + ".flo")
            flowlib.write_flow_png(flow, stem + ".png")
            if item["flow"].shape[-1] == 3:
                # KITTI-benchmark submission format
                flowlib.write_kitti_png_flow(flow, stem + "_kitti.png")
            if args.verbose:
                print(f"  [{i + j + 1}/{n}] AEE {aee:.4f} -> {stem}")
        i += len(items)
    return aee_sum / max(n, 1), n


def _make_eval_dataset(args):
    from flownet2_tf_tpu.data import loader as L

    if getattr(args, "tfrecords", None):
        if not (args.image_height and args.image_width):
            raise SystemExit(
                "--tfrecords eval needs --image_height/--image_width"
            )
        return L.TFRecordFlowDataset(
            args.tfrecords, args.image_height, args.image_width
        )
    name = args.dataset.lower()
    if name == "synthetic":
        return L.SyntheticFlowDataset(
            size=args.limit or 8, height=128, width=128, seed=0
        )
    if name == "sintel":
        return L.SintelDataset(args.data_root, render_pass=args.render_pass)
    if name == "kitti":
        return L.KittiDataset(args.data_root)
    if name in ("chairs", "flying_chairs"):
        return L.FlyingChairsRawDataset(args.data_root)
    if name in ("things", "flying_things_3d"):
        return L.FlyingThings3DDataset(args.data_root)
    if name in ("sdhom", "chairs_sdhom"):
        return L.ChairsSDHomDataset(args.data_root)
    raise SystemExit(f"unknown eval dataset {args.dataset!r}")


def cmd_bench(args):
    from flownet2_tf_tpu.tools import bench as bench_mod

    result = bench_mod.run_bench(
        model=args.model,
        height=args.height,
        width=args.width,
        batch=args.batch,
        iters=args.iters,
        compute_dtype=args.compute_dtype,
    )
    print(json.dumps(result))
    return 0


def cmd_make_tfrecords(args):
    from flownet2_tf_tpu.tools.make_tfrecords import convert_flying_chairs

    n_train, n_val = convert_flying_chairs(
        args.data_root,
        args.out,
        out_val=args.out_val,
        val_count=args.val_count,
        seed=args.seed,
    )
    print(json.dumps({"train": n_train, "val": n_val, "out": args.out}))
    return 0


def cmd_profile(args):
    from flownet2_tf_tpu.tools import profiler

    trace_dir = profiler.trace_model(
        model_name=args.model,
        height=args.height,
        width=args.width,
        batch=args.batch,
        iters=args.iters,
        compute_dtype=args.compute_dtype,
        trace_dir=args.trace_dir,
        warp_mode=args.warp_mode,
    )
    profiler.print_summary(trace_dir, top=args.top)
    print(json.dumps({"trace_dir": trace_dir}))
    return 0


def cmd_convert(args):
    from flownet2_tf_tpu.tools.convert_tf1_checkpoint import (
        convert,
        semantic_canary,
    )

    n = convert(args.tf_checkpoint, args.model, args.out)
    out = {"converted_variables": n, "out": args.out}
    if not args.no_canary:
        # names/shapes alone would load a semantically-mismatched
        # checkpoint cleanly; run the converted model on the bundled
        # sample pair and require sane flow (VERDICT r2 missing #1)
        out["canary"] = semantic_canary(
            args.out, args.model, sample_dir=args.sample_dir
        )
    print(json.dumps(out))
    return 0


def parse_export_shapes(args):
    """Validate/parse ``export --aot --shapes`` BEFORE the checkpoint
    load, so usage errors are instant. Returns [(h, w, b), ...] or None.
    """
    if not getattr(args, "shapes", None):
        return None
    if args.data_parallel or args.spatial_tiles:
        # the bundle path compiles single-chip entries only; dropping
        # these silently would ship an artifact the user believes is
        # sharded
        raise SystemExit(
            "--shapes bundles are single-chip; --data_parallel/"
            "--spatial_tiles only apply to single-shape exports"
        )
    shapes = []
    for spec in args.shapes.split(","):
        parts = spec.lower().split("x")
        usage = (
            f"--shapes: malformed entry {spec!r}; expected "
            "HxW or HxWxB with positive integers "
            "(e.g. 448x1024,384x1280x4)"
        )
        if len(parts) not in (2, 3):
            raise SystemExit(usage)
        try:
            dims = [int(p) for p in parts]
        except ValueError:
            raise SystemExit(usage) from None
        if any(d <= 0 for d in dims):
            raise SystemExit(usage)
        h, w = dims[0], dims[1]
        b = dims[2] if len(dims) == 3 else 1
        shapes.append((h, w, b))
    return shapes


def cmd_export(args):
    """Orbax run dir -> portable .npz weights, or --aot .flowpak."""
    import numpy as np

    from flownet2_tf_tpu.training import warmstart

    shapes = parse_export_shapes(args) if getattr(args, "aot", False) else None
    tree = warmstart.load_params_tree(args.ckpt)
    if getattr(args, "aot", False):
        from flownet2_tf_tpu.tools import aot

        platforms = (
            args.platforms.split(",") if args.platforms else None
        )
        if shapes is not None:
            meta = aot.export_serving_bundle(
                args.model, tree, shapes, args.out,
                compute_dtype=args.compute_dtype,
                warp_mode=args.warp_mode, platforms=platforms,
            )
        else:
            meta = aot.export_serving(
                args.model, tree, args.height, args.width, args.out,
                batch=args.batch, compute_dtype=args.compute_dtype,
                warp_mode=args.warp_mode, platforms=platforms,
                data_parallel=args.data_parallel,
                spatial_tiles=args.spatial_tiles,
                spatial_overlap=args.spatial_overlap,
            )
        print(json.dumps({"out": args.out, **meta}))
        return 0
    flat = warmstart.flatten(tree)
    np.savez(args.out, **flat)
    print(json.dumps({"leaves": len(flat), "out": args.out}))
    return 0


def cmd_info(args):
    """Model card: per-scope parameter counts (+ analytic FLOPs/pair
    via XLA cost analysis with --flops; compiles the forward once)."""
    import jax
    import numpy as np

    from flownet2_tf_tpu.models.registry import get_model

    m = get_model(args.model)
    params = m.init(jax.random.PRNGKey(0))

    def count(tree):
        return int(sum(np.prod(x.shape) for x in
                       jax.tree_util.tree_leaves(tree)))

    out = {
        "model": args.model,
        "name": m.name,
        "params_total": count(params),
        "params_by_scope": {
            k: count(v) for k, v in sorted(params.items())
        },
    }
    if args.flops:
        import jax.numpy as jnp

        from flownet2_tf_tpu.tools import benchlib

        img = jnp.zeros((args.batch, args.height, args.width, 3),
                        jnp.float32)
        flops, hbm = benchlib.cost_analysis(
            lambda p, a, b: m.apply(
                p, {"input_a": a, "input_b": b},
                compute_dtype=jnp.bfloat16,
            )["flow"].mean(),
            params, img, img,
        )
        if flops:
            out["gflops_per_batch"] = round(flops / 1e9, 3)
            out["gflops_per_pair"] = round(flops / 1e9 / args.batch, 3)
        if hbm:
            out["hbm_gb_xla_opsum_bound"] = round(hbm / 1e9, 3)
        out["at"] = f"{args.batch}x{args.height}x{args.width} bf16"
    print(json.dumps(out, indent=1))
    return 0


def cmd_serve(args):
    """Run a .flowpak artifact on an image pair — no model code on the
    serving path; the graph lives in the artifact (tools/aot.py)."""
    from flownet2_tf_tpu.tools.aot import load_serving
    from flownet2_tf_tpu.training.infer import (
        load_image_pair,
        write_flow_outputs,
    )

    model = load_serving(args.artifact)
    a, b = load_image_pair(args.input_a, args.input_b)
    flow = model.infer_pair(a, b)
    write_flow_outputs(flow, args.out, args.input_a,
                       save_flo=not args.no_flo,
                       save_image=not args.no_image)
    print(json.dumps({
        "artifact": args.artifact,
        **{k: model.meta[k] for k in ("model", "compute_dtype",
                                      "warp_mode")},
        "flow_shape": list(flow.shape),
        "mean_magnitude": float(
            ((flow[..., 0] ** 2 + flow[..., 1] ** 2) ** 0.5).mean()
        ),
        "out_dir": args.out,
    }))
    return 0


def build_parser():
    parser = argparse.ArgumentParser(prog="flownet2_tf_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="train a model")
    _add_common_model_arg(p)
    p.add_argument("--dataset", default="chairs")
    p.add_argument("--data_root", default=None)
    p.add_argument("--tfrecords_train", default=None,
                   help="override the dataset config's train TFRecords")
    p.add_argument("--tfrecords_val", default=None)
    p.add_argument("--image_height", type=int, default=None,
                   help="override dataset config IMAGE_HEIGHT")
    p.add_argument("--image_width", type=int, default=None)
    p.add_argument("--crop_height", type=int, default=None,
                   help="override augmentation crop (multiple of 64)")
    p.add_argument("--crop_width", type=int, default=None)
    p.add_argument("--schedule", default="long",
                   help="long (S_long), fine (S_fine), short")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--checkpoint_every", type=int, default=2500)
    p.add_argument("--image_summary_every", type=int, default=0,
                   help="write TensorBoard image summaries every N steps")
    p.add_argument("--eval_every", type=int, default=0,
                   help="evaluate validation EPE every N steps")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() at startup")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward pass (activation-memory "
                        "savings for stacked models at large crops)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="scan the fwd+bwd over N microbatches per step, "
                        "averaging gradients (same optimizer semantics, "
                        "~N-fold lower activation memory; composes with "
                        "--remat). Batch size must divide by N")
    p.add_argument("--transfer_flow_dtype", default="float32",
                   choices=["float32", "float16", "bfloat16"],
                   help="host->device GT-flow wire dtype; float16 "
                        "near-halves the dominant per-step transfer "
                        "(upcast on device; measured trade: "
                        "benchmarks/flow_transfer_ab.py)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the procedural dataset (no downloads)")
    p.add_argument("--synthetic_size", type=int, default=512)
    p.add_argument("--synthetic_height", type=int, default=128)
    p.add_argument("--synthetic_width", type=int, default=128)
    p.add_argument(
        "--warm_start", action="append", default=None,
        metavar="PATH:SRC_SCOPE:DST_SCOPE",
        help="splice a prior-stage checkpoint, e.g. "
             "./logs/flownet_c::FlowNetC (repeatable)",
    )
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("test", help="single-pair inference")
    _add_common_model_arg(p)
    p.add_argument("--ckpt", default=None,
                   help="default: ./checkpoints/<Model>/<model>.npz")
    p.add_argument("--input_a", required=True)
    p.add_argument("--input_b", required=True)
    p.add_argument("--out", default="./")
    p.add_argument("--no_image", action="store_true")
    p.add_argument("--no_flo", action="store_true")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["bfloat16", "float32"])
    p.add_argument("--spatial_tiles", type=int, default=0,
                   help=">1: halo-banded spatially-parallel inference, "
                        "one band per mesh device (parallel/spatial.py)")
    p.add_argument("--spatial_overlap", type=int, default=128,
                   help="halo rows per band side (multiple of 32); "
                        "accuracy table in docs/DESIGN.md")
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("eval", help="dataset AEE evaluation")
    _add_common_model_arg(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dataset", default="sintel")
    p.add_argument("--data_root", default=None)
    p.add_argument("--tfrecords", default=None,
                   help="evaluate a TFRecord file instead of a raw layout")
    p.add_argument("--image_height", type=int, default=None)
    p.add_argument("--image_width", type=int, default=None)
    p.add_argument("--render_pass", default="clean",
                   choices=["clean", "final"])
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--eval_batch", type=int, default=1,
                   help="batch pairs within a %%64 shape bucket "
                        "(metric unchanged; batching pays on TPU)")
    p.add_argument("--save_outputs", default=None,
                   help="also write each predicted flow to this dir "
                        "(.flo + .png, + KITTI 16-bit PNG for masked "
                        "GT); fetches full flows — slower than the "
                        "on-device AEE path")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["bfloat16", "float32"])
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("bench", help="throughput benchmark")
    _add_common_model_arg(p)
    p.add_argument("--height", type=int, default=448)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser(
        "make-tfrecords",
        help="raw FlyingChairs -> reference-layout TFRecords",
    )
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--out_val", default=None)
    p.add_argument("--val_count", type=int, default=640)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_make_tfrecords)

    p = sub.add_parser("profile", help="trace + per-op device-time summary")
    _add_common_model_arg(p)
    p.add_argument("--height", type=int, default=448)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--trace_dir", default="/tmp/flownet2_trace")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--warp_mode", default=None, choices=["full", "half"],
                   help="'half' profiles the serving preset (half-res "
                        "stack warps); 'full' pins exact warps; default "
                        "follows --warp_res / the env knobs (exact if "
                        "unset)")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("convert", help="TF1 checkpoint -> .npz")
    _add_common_model_arg(p)
    p.add_argument("--tf_checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--sample_dir", default="data/samples",
        help="sample-pair dir for the post-conversion semantic canary",
    )
    p.add_argument(
        "--no_canary", action="store_true",
        help="skip the semantic sanity run on the sample pair",
    )
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser(
        "export",
        help="orbax training run -> portable .npz weights, or (--aot) a "
             "compiled .flowpak serving artifact",
    )
    p.add_argument("--ckpt", required=True,
                   help="run log_dir or checkpoint step directory")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--aot", action="store_true",
        help="export an ahead-of-time compiled serving artifact "
             "(jax.export StableHLO + weights in one zip) instead of "
             "raw weights; shape-specialized to --height x --width",
    )
    p.add_argument("--model", default="2",
                   help="model name (AOT export only): s, c, cs, css, "
                        "sd, 2")
    p.add_argument("--height", type=int, default=448)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument(
        "--shapes", default=None,
        help="comma list of HxW or HxWxB entries (e.g. "
             "448x1024,384x1280x4): export ONE bundle .flowpak holding "
             "a compiled forward per shape with shared weights; the "
             "loader dispatches per call on the input shape. Overrides "
             "--height/--width/--batch; single-chip entries only",
    )
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument(
        "--warp_mode", default="half",
        choices=["half", "quarter", "full"],
        help="half = serving preset (1.55x; AEE delta within +-0.011 px "
             "on trained weights — +0.006..+0.011 on the r3 192x256 "
             "curriculum, -0.010 on the r4 320x448 one: docs/DESIGN.md); "
             "quarter = coarser still (measured trade: "
             "results.json::warp_res_ab); full = exact warps (parity "
             "path)",
    )
    p.add_argument(
        "--platforms", default=None,
        help="comma list (e.g. tpu,cpu) for a multi-platform artifact; "
             "default: current backend only",
    )
    p.add_argument(
        "--data_parallel", type=int, default=0,
        help="export the forward pjit-sharded over an N-chip ('data',) "
             "mesh (params replicated, batch split); needs batch %% N "
             "== 0 and N devices at export and load",
    )
    p.add_argument(
        "--spatial_tiles", type=int, default=0,
        help="freeze halo-banded spatial parallelism into the artifact "
             "(one H-band per chip, batch=1; exclusive with "
             "--data_parallel)",
    )
    p.add_argument("--spatial_overlap", type=int, default=128)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "info", help="model card: parameter counts, optional FLOPs"
    )
    p.add_argument("--model", default="2")
    p.add_argument("--flops", action="store_true",
                   help="also report analytic FLOPs/pair (compiles once)")
    p.add_argument("--height", type=int, default=448)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser(
        "serve", help="run a .flowpak AOT artifact on an image pair"
    )
    p.add_argument("--artifact", required=True, help=".flowpak path")
    p.add_argument("--input_a", required=True)
    p.add_argument("--input_b", required=True)
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--no_image", action="store_true")
    p.add_argument("--no_flo", action="store_true")
    p.set_defaults(fn=cmd_serve)

    return parser


def _enable_compilation_cache():
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()


def main(argv=None):
    args = build_parser().parse_args(argv)
    _enable_compilation_cache()
    _apply_perf_flags(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
