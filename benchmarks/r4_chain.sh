#!/bin/bash
# Round-4 detached TPU chain, ordered short-first so the discrete
# VERDICT items (#2 unroll A/B, #3 memory story) land even if the
# round ends before the long curriculum retrain (#5) finishes.
# Run detached (setsid nohup) so it survives driver session restarts.
# Each step appends to benchmarks/results.json; progress to the log.
cd "$(dirname "$0")/.."

export FLOWNET2_CURRICULUM_NAME=r4_curriculum_320x448
export FLOWNET2_AB_EVAL_HW=320x448

echo "=== [1/6] unroll_ab (VERDICT #2) $(date -u +%H:%M:%S) ==="
# 14400s: worst case is 8 variants x 2 x 900s child attempts (ADVICE
# r4 — the old 2400s could kill a sweep mid-flight on a slow relay
# day). Historical script; r5_chain.sh supersedes it.
timeout 14400 python benchmarks/unroll_ab.py || echo "unroll_ab FAILED ($?)"

echo "=== [2/6] memory_bench --big --time (VERDICT #3) $(date -u +%H:%M:%S) ==="
timeout 5400 python benchmarks/memory_bench.py --big --time --models css,2 \
    || echo "memory_bench FAILED ($?)"

echo "=== [3/6] curriculum_train @320x448 (VERDICT #5) $(date -u +%H:%M:%S) ==="
timeout 3600 python benchmarks/curriculum_train.py --height 320 --width 448 \
    || echo "curriculum_train FAILED ($?)"

echo "=== [4/6] curriculum_eval @320x448 $(date -u +%H:%M:%S) ==="
timeout 1200 python benchmarks/curriculum_eval.py \
    --runs r4_curriculum_320x448 --stages c,cs,css,sd,2 \
    || echo "curriculum_eval FAILED ($?)"

echo "=== [5/6] warp_res_ab on 320x448 weights $(date -u +%H:%M:%S) ==="
timeout 2400 python benchmarks/warp_res_ab.py || echo "warp_res_ab FAILED ($?)"

echo "=== [6/6] f32_precision_probe on 320x448 weights $(date -u +%H:%M:%S) ==="
timeout 1800 python benchmarks/f32_precision_probe.py \
    || echo "f32_precision_probe FAILED ($?)"

echo "=== r4_chain done $(date -u +%H:%M:%S) ==="

echo "=== [7/7] unroll_ab retry (hardened) $(date -u +%H:%M:%S) ==="
timeout 4800 python benchmarks/unroll_ab.py || echo "unroll_ab retry FAILED ($?)"
echo "=== r4_chain fully done $(date -u +%H:%M:%S) ==="
