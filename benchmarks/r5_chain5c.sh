#!/bin/bash
# Round-5 chain, part 5c: restructured remainder of chain 5.
#
# Chain 5's single retrain step (all five stages under one 5400 s
# timeout) was on track to be killed mid-stage-2 — the slowest stage,
# with only an end-of-stage checkpoint, so the timeout would have cost
# the whole 1600-step fusion retrain. This chain replaces it after
# stage c checkpointed: one arbitered step PER STAGE (a kill costs at
# most one stage), and stage 2 checkpoints every 400 steps + gets a
# resume step, so even its own timeout only costs <400 steps.
# Measurement steps are unchanged from chain 5.
cd "$(dirname "$0")/.."

ARB="python -m flownet2_tf_tpu.tools.arbiter run --timeout 7200 --"
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" $ARB "$@" || echo "[$name] FAILED ($?)"
  echo "=== [$name] end $(date -u +%H:%M:%S) ==="
}

export FLOWNET2_AB_EVAL_HW=320x448
export FLOWNET2_CURRICULUM_NAME=r4_curriculum_320x448

CT="python benchmarks/curriculum_train.py --height 320 --width 448"

step "retrain_cs"  1500 $CT --stages cs
step "retrain_css" 1500 $CT --stages css
step "retrain_sd"  1200 $CT --stages sd
step "retrain_2"   3600 $CT --stages 2 --steps 2=1600 --checkpoint_every 400
# resume pass: no-op if retrain_2 finished; otherwise continues from
# the last 400-step checkpoint to 1600
step "retrain_2_resume" 2400 $CT --stages 2 --steps 2=1600 \
    --checkpoint_every 400

step "fusion_res_ab" 3000 python benchmarks/fusion_res_ab.py

step "curriculum_eval" 1500 python benchmarks/curriculum_eval.py \
    --runs r4_curriculum_320x448 --stages c,cs,css,sd,2

step "fusion_value_std" 1500 python benchmarks/fusion_value.py \
    --run r4_curriculum_320x448

step "op_ledger_b8" 1800 python benchmarks/op_ledger.py --capture 2 \
    --scan --batch 8 --iters 3 --json_out

step "bench_run1" 1500 python bench.py
step "bench_run2" 1500 python bench.py

echo "=== manifest check $(date -u +%H:%M:%S) ==="
python benchmarks/check_manifest.py \
  "fusion_res_ab.forward_ms" \
  "fusion_res_ab.aee_exact_f32_fusion_k2" \
  "fusion_res_ab.aee_preset_bf16_halfwarp_fusion_k2" \
  "curriculum_eval.r4_curriculum_320x448/c" \
  "curriculum_eval.r4_curriculum_320x448/2" \
  "fusion_value.r4_curriculum_320x448" \
  "op_ledger.b8.by_scope" \
  || echo "MANIFEST INCOMPLETE (see diff above)"
echo "=== r5_chain5c done $(date -u +%H:%M:%S) ==="
