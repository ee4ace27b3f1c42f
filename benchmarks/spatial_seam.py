"""Spatial-tiling seam error on TRAINED weights (VERDICT r2 #7).

tests/test_spatial.py bounds tiled-vs-full deltas loosely on random
init; this quantifies the real thing: the trained curriculum FlowNetS
(logs/r3_curriculum/s) run full-frame vs H-band-tiled
(parallel/spatial.py), for overlap in {32, 64, 128} and n_tiles in
{2, 4, 8}, reporting

  * mean |flow_tiled - flow_full| over the whole frame, and
  * the same restricted to seam regions (rows within 16 px of a band
    boundary) — where the halo approximation actually bites.

Runs single-chip: bands ride the batch axis of the 1-device mesh, so
this measures the stitching approximation exactly as an 8-chip mesh
would see it (numerics don't depend on how bands map to devices).

Usage: python benchmarks/spatial_seam.py
Appends "spatial_seam" to benchmarks/results.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CKPT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "logs", "r3_curriculum",
                 "s")
)


def main():
    import orbax.checkpoint as ocp

    import jax
    import jax.numpy as jnp
    from flownet2_tf_tpu.models.registry import get_model
    from flownet2_tf_tpu.data.loader import SyntheticFlowDataset
    from flownet2_tf_tpu.parallel.spatial import infer_flow_spatial
    from flownet2_tf_tpu.tools.benchlib import enable_compilation_cache

    enable_compilation_cache()
    model = get_model("s")

    mgr = ocp.CheckpointManager(os.path.join(CKPT, "checkpoints"))
    step = mgr.latest_step()
    trained = step is not None
    if trained:
        params = mgr.restore(step)["params"]
        print(f"trained FlowNetS @step {step}", flush=True)
    else:
        params = model.init(jax.random.PRNGKey(0))
        print("no trained ckpt — random init (rerun after "
              "curriculum_train.py)", flush=True)

    # held-out scenes at an 8-band-splittable size
    h, w = 512, 768
    ds = SyntheticFlowDataset(size=4, height=h, width=w, seed=4321,
                              max_flow=8.0)

    @jax.jit
    def full_fwd(p, a, b):
        return model.apply(
            p, {"input_a": a, "input_b": b}, compute_dtype=None
        )["flow"]

    rows = {}
    scenes = [ds[i] for i in range(len(ds))]
    fulls = [
        np.asarray(
            full_fwd(params, jnp.asarray(s["image_a"])[None],
                     jnp.asarray(s["image_b"])[None])
        )[0]
        for s in scenes
    ]

    for n_tiles in (2, 4, 8):
        for overlap in (32, 64, 128):
            deltas, seam_deltas = [], []
            for s, full in zip(scenes, fulls):
                tiled = infer_flow_spatial(
                    "s", params, s["image_a"], s["image_b"],
                    n_tiles=n_tiles, overlap=overlap,
                    compute_dtype="float32",
                )
                d = np.abs(tiled - full).mean(-1)
                deltas.append(d.mean())
                core = -(-h // n_tiles)
                core = -(-core // 64) * 64
                seam_rows = []
                for k in range(1, n_tiles):
                    y = k * core
                    if y >= h:
                        continue
                    seam_rows.append(d[max(0, y - 16): y + 16])
                if seam_rows:
                    seam_deltas.append(
                        np.concatenate(seam_rows).mean()
                    )
            key = f"n{n_tiles}_ov{overlap}"
            rows[key] = {
                "n_tiles": n_tiles,
                "overlap": overlap,
                "mean_abs_delta_px": float(np.mean(deltas)),
                "seam_mean_abs_delta_px": (
                    float(np.mean(seam_deltas)) if seam_deltas else None
                ),
            }
            print(f"  {key}: frame {rows[key]['mean_abs_delta_px']:.5f} "
                  f"px, seam {rows[key]['seam_mean_abs_delta_px']} px",
                  flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out_path) as f:
        results = json.load(f)
    results["spatial_seam"] = {
        "trained_weights": trained,
        "height": h,
        "width": w,
        "scenes": len(scenes),
        **rows,
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
