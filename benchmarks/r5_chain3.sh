#!/bin/bash
# Round-5 chain, part 3: RECOVERY. The host rebooted between r5_chain.sh
# and r5_chain2.sh, wiping logs/ (trained checkpoints) and the part-2
# measurements. This chain re-lands them under the same contract
# (VERDICT r4 #5): arbitered steps, per-step timeouts, incremental
# persistence, end-of-chain manifest.
#
# Order: ledger first (no weights needed), then retrain the standard
# curriculum at the deepened step counts (seeded: SyntheticFlowDataset
# seed=7, Trainer PRNG fixed — reproduces the committed eval rows),
# then the fusion-res A/B on those weights, then the back-to-back
# headline reproducibility pair.
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

# --- 1. op ledger v3 (per-layer by_scope), b1 and b8: the targeting
# table for the serving attack (VERDICT r4 #4).
step "op_ledger_b1" 1800 python benchmarks/op_ledger.py --capture 2 \
    --scan --batch 1 --iters 3 --json_out
step "op_ledger_b8" 1800 python benchmarks/op_ledger.py --capture 2 \
    --scan --batch 8 --iters 3 --json_out

# --- 2. restore the deepened standard curriculum (weights were wiped;
# training is seeded so this reproduces the committed curriculum_eval).
step "retrain_curriculum" 5400 python benchmarks/curriculum_train.py \
    --height 320 --width 448 --stages c,cs,css,sd,2 \
    --steps c=2400,2=1600

# --- 3. half-res fusion A/B on the restored weights: speed b1+b8 and
# the four-way AEE grid (exact/preset x fusion_k 1/2).
step "fusion_res_ab" 3000 python benchmarks/fusion_res_ab.py

# --- 4. back-to-back headline reproducibility (VERDICT r4 #1
# done-criterion: two arbitered runs within 5%).
step "bench_run1" 1500 python bench.py
step "bench_run2" 1500 python bench.py

echo "=== manifest check $(date -u +%H:%M:%S) ==="
python benchmarks/check_manifest.py \
  op_ledger.b1.by_scope op_ledger.b8.by_scope \
  fusion_res_ab.forward_ms fusion_res_ab.aee_exact_f32_fusion_k2 \
  fusion_res_ab.aee_preset_bf16_halfwarp_fusion_k2 \
  || echo "MANIFEST INCOMPLETE (see diff above)"
echo "=== r5_chain3 done $(date -u +%H:%M:%S) ==="
