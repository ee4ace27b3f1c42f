#!/bin/bash
# Round-5 detached TPU chain. Contract (VERDICT r4 #5): every step
#   * runs under the exclusive TPU arbiter (tools/arbiter.py), so the
#     driver's bench or an interactive session can never interleave
#     device work with a measurement (the r4 headline was falsified by
#     exactly that);
#   * persists incrementally (per row / per stage) inside the step;
#   * has its own timeout sized for the step, not the chain;
#   * and the chain ends with a manifest check that every expected
#     results.json key actually landed (prints the found/missing diff).
# Ordered short-first by deliverable: the memory story (#3, third ask)
# lands before the hour-long curricula.
cd "$(dirname "$0")/.."

ARB="python -m flownet2_tf_tpu.tools.arbiter run --timeout 7200 --"
step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" $ARB "$@" || echo "[$name] FAILED ($?)"
  echo "=== [$name] end $(date -u +%H:%M:%S) ==="
}

export FLOWNET2_AB_EVAL_HW=320x448

# --- 1. memory story (VERDICT r4 #3): per-(model,config) invocations,
# each inside its own budget; rows persist per variant inside.
for mc in "css 320x448x8" "2 320x448x8" "css 448x1024x8" \
          "2 448x1024x8" "css 320x448x32" "2 320x448x32"; do
  set -- $mc
  step "mem_$1_$2" 2400 python benchmarks/memory_bench.py --time \
      --models "$1" --configs "$2" --variants base,remat,ga4,remat_ga4
done

# --- 2. fusion study (VERDICT r4 #2): mixed-displacement curriculum,
# fusion trained 1600 steps, then the per-subset value eval.
export FLOWNET2_CURRICULUM_NAME=r5_mixed_320x448
step "mixed_curriculum" 6000 python benchmarks/curriculum_train.py \
    --height 320 --width 448 --motion mixed --stages c,cs,css,sd,2 \
    --steps 2=1600
step "fusion_value" 1500 python benchmarks/fusion_value.py \
    --run r5_mixed_320x448

# --- 3. deepen the standard 320x448 curriculum (VERDICT r4 #7):
# resume C 600->2400 and fusion 400->1600, then refresh the eval rows.
export FLOWNET2_CURRICULUM_NAME=r4_curriculum_320x448
step "deepen_c_and_fusion" 4800 python benchmarks/curriculum_train.py \
    --height 320 --width 448 --stages c,2 --steps c=2400,2=1600
step "curriculum_eval" 1500 python benchmarks/curriculum_eval.py \
    --runs r4_curriculum_320x448 --stages c,cs,css,sd,2
step "fusion_value_std" 1500 python benchmarks/fusion_value.py \
    --run r4_curriculum_320x448

# --- 4. manifest: declare every key this chain was supposed to land.
echo "=== manifest check $(date -u +%H:%M:%S) ==="
python benchmarks/check_manifest.py \
  train_memory.css_320x448_b8 train_memory.css_320x448_b8_remat \
  train_memory.css_320x448_b8_ga4 train_memory.css_320x448_b8_remat_ga4 \
  train_memory.2_320x448_b8 train_memory.2_320x448_b8_remat \
  train_memory.2_320x448_b8_ga4 train_memory.2_320x448_b8_remat_ga4 \
  train_memory.css_448x1024_b8 train_memory.2_448x1024_b8 \
  train_memory.css_320x448_b32 train_memory.2_320x448_b32 \
  "fusion_value.r5_mixed_320x448.2" \
  "fusion_value.r4_curriculum_320x448.2" \
  "curriculum_eval.r4_curriculum_320x448/c" \
  "curriculum_eval.r4_curriculum_320x448/2" \
  || echo "MANIFEST INCOMPLETE (see diff above)"
echo "=== r5_chain done $(date -u +%H:%M:%S) ==="
