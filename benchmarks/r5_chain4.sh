#!/bin/bash
# Round-5 chain, part 4: evals that need part 3's deepened checkpoints
# (r5_chain3.sh retrains c=2400 / 2=1600 after the reboot wiped logs/).
# Launched by a wrapper that waits for chain 3's process to exit.
# Same contract as the other r5 chains: arbitered steps, per-step
# timeouts, incremental persistence, end manifest (VERDICT r4 #5).
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

# --- 1. refresh the per-stage eval table on the deepened weights
# (VERDICT r4 #7 done-criterion: C < 3 px at 2400 steps, fusion from
# 1600 steps).
step "curriculum_eval" 1500 python benchmarks/curriculum_eval.py \
    --runs r4_curriculum_320x448 --stages c,cs,css,sd,2

# --- 2. fusion-value CONTROL on the standard (no-regime-split)
# curriculum: the r5_mixed row showed fusion beats both branches when
# the data has a displacement split; this documents what happens when
# it does not (expected: ~parity with the best branch once trained
# past the r4 400-step underfit).
step "fusion_value_std" 1500 python benchmarks/fusion_value.py \
    --run r4_curriculum_320x448

echo "=== manifest check $(date -u +%H:%M:%S) ==="
python benchmarks/check_manifest.py \
  "curriculum_eval.r4_curriculum_320x448/c" \
  "curriculum_eval.r4_curriculum_320x448/2" \
  "fusion_value.r4_curriculum_320x448" \
  || echo "MANIFEST INCOMPLETE (see diff above)"
echo "=== r5_chain4 done $(date -u +%H:%M:%S) ==="
