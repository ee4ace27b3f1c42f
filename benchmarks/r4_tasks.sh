#!/bin/bash
# Round-4 measured-task chain (VERDICT r3 #3 and #5), run serially on
# the single TPU chip:
#   1. retrain the synthetic curriculum at the blueprint's 320x448 crop
#      (r3 trained at 192x256; the trained-weights A/B tables must be
#      anchored at the crop every train bench uses),
#   2. held-out AEE per stage at 320x448,
#   3. re-run the accuracy sides of the warp-res and f32-precision A/Bs
#      on the 320x448 weights,
#   4. HBM memory accounting for remat/grad_accum at the reference crop
#      AND the big regimes (448x1024 b8, 320x448 b32), timed.
# Each step appends to benchmarks/results.json.
set -e
cd "$(dirname "$0")/.."

export FLOWNET2_CURRICULUM_NAME=r4_curriculum_320x448
export FLOWNET2_AB_EVAL_HW=320x448

echo "=== [1/5] curriculum_train @320x448 ==="
timeout 3000 python benchmarks/curriculum_train.py --height 320 --width 448

echo "=== [2/5] curriculum_eval @320x448 ==="
timeout 1200 python benchmarks/curriculum_eval.py \
    --runs r4_curriculum_320x448 --stages c,cs,css,sd,2

echo "=== [3/5] warp_res_ab (speed + AEE on 320x448 weights) ==="
timeout 2400 python benchmarks/warp_res_ab.py

echo "=== [4/5] f32_precision_probe on 320x448 weights ==="
timeout 1800 python benchmarks/f32_precision_probe.py

echo "=== [5/5] memory_bench --big --time ==="
timeout 5400 python benchmarks/memory_bench.py --big --time --models css,2

echo "=== r4_tasks done ==="
