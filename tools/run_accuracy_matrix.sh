#!/bin/bash
# Fidelity matrix on the DISCRIMINATIVE store (coef_jitter=0.2,
# Bayes-optimal verification ceiling ~0.94 — data/synthetic.py): runs
# every perf-feature row at an operating point where a regression is
# visible (round-3 verdict item 3). Sequential — ONE chip, one host core.
#
# Multi-seed (round-4 verdict item 5): SEEDS="0 1 2" runs every row once
# per seed (seed drives init AND data order; non-zero seeds get an _sN row
# suffix). Aggregate repeats into mean±range with
#   python tools/aggregate_matrix_seeds.py docs/ACCURACY.md --prefix j20
#
# Usage: nohup bash tools/run_accuracy_matrix.sh > /tmp/casia_j20.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
STORE=/root/casia_syn_j20
SEEDS="${SEEDS:-0}"
COMMON="--store $STORE --coef_jitter 0.2 --ids 10500 --images_per_id 12 --epochs 2 --out docs/ACCURACY.md"

run_row() {
  for s in $SEEDS; do
    python tools/casia_scale_study.py $COMMON "$@" --seed "$s"
  done
}

# 1. dense f32 full softmax — the control that calibrates the operating point
run_row --heads full_softmax --tag j20dense
# 2. FFC dense f32 — the flagship claim
run_row --heads ffc --tag j20
# 2b. FFC fused f32 — the streaming-kernel control the int8 rows diff against
run_row --heads ffc --use_fused on --tag j20fused
# 3. int8-stored queue
run_row --heads ffc --use_fused on --queue_dtype int8 --tag j20int8q
# 4. int8 compute on top
run_row --heads ffc --use_fused on --queue_dtype int8 --int8_compute --tag j20int8c
# 5. the bench softmax row's storage dtypes: fused bf16 classifier+momentum
run_row --heads full_softmax --use_fused on \
  --cls_dtype bfloat16 --mom_dtype bfloat16 --tag j20bf16mom
# 5b. unconfounder: fused + bf16 classifier + f32 MOMENTUM — isolates the
#     momentum dtype against row 5 (round-4 verdict weak #5)
run_row --heads full_softmax --use_fused on \
  --cls_dtype bfloat16 --mom_dtype float32 --tag j20fusedbf16cls
# 6. ir50 + int8 queue + int8 compute — the capacity bench row's exact
#    feature combination
run_row --heads ffc --net ir50 --use_fused on --queue_dtype int8 \
  --int8_compute --tag j20ir50int8c
echo "MATRIX DONE"
