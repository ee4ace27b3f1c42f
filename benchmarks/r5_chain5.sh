#!/bin/bash
# Round-5 chain, part 5: SECOND recovery. A second host reboot
# (~21:37) killed chain 3 mid-retrain (only op_ledger.b1 v3 landed)
# and chain 4 never started. This re-lands everything still missing,
# reordered so the curriculum-dependent measurements come first and a
# third reboot costs the least:
#   1. retrain the deepened seeded curriculum (logs/ wiped again)
#   2. fusion_res_ab on those weights (serving attack, VERDICT r4 #4)
#   3. curriculum_eval refresh (VERDICT r4 #7: c=2400, 2=1600)
#   4. fusion_value control on the standard curriculum
#   5. op ledger v3 at b8 (per-layer serving targeting table)
#   6. back-to-back arbitered bench pair (VERDICT r4 #1 done-criterion)
# Same contract as every r5 chain: arbitered steps, per-step timeouts,
# incremental persistence, end-of-chain manifest (VERDICT r4 #5).
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

step "retrain_curriculum" 5400 python benchmarks/curriculum_train.py \
    --height 320 --width 448 --stages c,cs,css,sd,2 \
    --steps c=2400,2=1600

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
echo "=== r5_chain5 done $(date -u +%H:%M:%S) ==="
