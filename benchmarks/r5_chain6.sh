#!/bin/bash
# Round-5 chain, part 6: THIRD-reboot recovery, final-session sizing.
#
# The third host reboot killed chain 5c before any step landed (logs/
# checkpoints wiped again; only committed state survives a reboot).
# This session has ~50 minutes of wall clock left in the round, so a
# full deepened retrain (~90 min) cannot fit. This chain lands the
# highest-value missing rows most-valuable-first and hard-bounds the
# tail so the TPU is free before the driver's end-of-round bench:
#   1+2. back-to-back arbitered bench pair (VERDICT r4 #1 done
#        criterion: reproduce within 5%)
#   3.   op ledger v3 at b8 (per-scope serving targeting table)
#   4.   fusion_res_ab speed side (VERDICT r4 #4 attack; the AEE side
#        needs trained weights that no longer exist — run what can be
#        run honestly and label the rest missing)
#   5.   as much stage-C retrain as fits (VERDICT r4 #7: C's 600-step
#        6.13 px anchor is barely trained), checkpointed every 300
#        steps so the timeout only costs the last partial block
#   6.   curriculum_eval refresh of stage c at whatever step landed
# Same contract as every r5 chain: arbitered steps, per-step timeouts,
# incremental persistence, end-of-chain manifest.
cd "$(dirname "$0")/.."

ARB="python -m flownet2_tf_tpu.tools.arbiter run --timeout 1200 --"
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" $ARB "$@" || echo "[$name] FAILED ($?)"
  echo "=== [$name] end $(date -u +%H:%M:%S) ==="
}

export FLOWNET2_AB_EVAL_HW=320x448
export FLOWNET2_CURRICULUM_NAME=r4_curriculum_320x448

step "bench_run1" 900 python bench.py
step "bench_run2" 900 python bench.py

step "op_ledger_b8" 1200 python benchmarks/op_ledger.py --capture 2 \
    --scan --batch 8 --iters 3 --json_out

step "fusion_res_speed" 900 python benchmarks/fusion_res_ab.py --skip_aee

step "retrain_c" 1000 python benchmarks/curriculum_train.py \
    --height 320 --width 448 --stages c --steps c=1200 \
    --checkpoint_every 300

step "curriculum_eval_c" 400 python benchmarks/curriculum_eval.py \
    --runs r4_curriculum_320x448 --stages c

echo "=== manifest check $(date -u +%H:%M:%S) ==="
python benchmarks/check_manifest.py \
  "fusion_res_ab.forward_ms" \
  "op_ledger.b8.by_scope" \
  "curriculum_eval.r4_curriculum_320x448/c" \
  || echo "MANIFEST INCOMPLETE (see diff above)"
echo "=== r5_chain6 done $(date -u +%H:%M:%S) ==="
