#!/bin/bash
# Round-5 chain, part 2: measurements that depend on part 1's outputs
# (deepened checkpoints) or on exclusive post-training device access.
# Same contract as r5_chain.sh: arbitered steps, own timeouts,
# incremental persistence, end manifest. Launched by a wrapper that
# waits for r5_chain.sh's process to exit first (steps would otherwise
# interleave per-lock-acquire and run before their inputs exist).
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

# --- 1. half-res fusion A/B on the deepened (1600-step) fusion weights
# (VERDICT r4 #4 "change WHAT is computed"): speed b1+b8 and AEE.
step "fusion_res_ab" 3000 python benchmarks/fusion_res_ab.py

# --- 2. op ledger v3 (per-layer by_scope) re-capture, b1 and b8, on
# the scanned serving graph — the targeting table for any further
# serving work.
step "op_ledger_b1" 1800 python benchmarks/op_ledger.py --capture 2 \
    --scan --batch 1 --iters 3 --json_out
step "op_ledger_b8" 1800 python benchmarks/op_ledger.py --capture 2 \
    --scan --batch 8 --iters 3 --json_out

# --- 3. re-verify the two train_memory rows whose timing window
# overlapped a stray interactive process (2_320x448_b8 base/remat);
# compiles are cached, so this is minutes.
step "mem_reverify" 1500 python benchmarks/memory_bench.py --time \
    --models 2 --configs 320x448x8 --variants base,remat

# --- 4. back-to-back reproducibility check of the arbitered headline
# (VERDICT r4 #1 done-criterion: two runs within 5%).
step "bench_run1" 1500 python bench.py
step "bench_run2" 1500 python bench.py

echo "=== manifest check $(date -u +%H:%M:%S) ==="
python benchmarks/check_manifest.py \
  fusion_res_ab.forward_ms "fusion_res_ab.aee_exact_f32_fusion_k2" \
  op_ledger.b1.by_scope op_ledger.b8.by_scope \
  train_memory.2_320x448_b8 \
  || echo "MANIFEST INCOMPLETE (see diff above)"
echo "=== r5_chain2 done $(date -u +%H:%M:%S) ==="
