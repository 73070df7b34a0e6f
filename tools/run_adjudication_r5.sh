#!/bin/bash
# Round-5 adjudication of the bf16-momentum discriminative regression
# (round-4 verdict item 2). The j20 matrix's full_softmax_j20bf16mom row
# read rank-1 0.3887 vs control 0.4464 — the only row outside std on a
# std-bearing metric. Runs, in decision-value order:
#   1. bf16mom seed 1      — does the regression REPRODUCE?
#   2. dense control seed 1 — calibrates run-to-run sigma (cheapest row)
#   3. fused + bf16 cls + f32 MOMENTUM (seed 0) — vs row 5 isolates the
#      momentum dtype; vs control isolates fused-kernel+cls-dtype
#   4. dense control seed 2 — second sigma point
#   5. fused + f32 cls + f32 mom (seed 0) — isolates the fused kernel alone
# Rows append to docs/ACCURACY.md (bare rows — header dedup in the study
# tool); aggregate with tools/aggregate_matrix_seeds.py.
# ONE chip, one host core — strictly sequential.
# Usage: nohup bash tools/run_adjudication_r5.sh > /tmp/adjudicate_r5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
STORE=/root/casia_syn_j20
COMMON="--store $STORE --coef_jitter 0.2 --ids 10500 --images_per_id 12 --epochs 2 --out docs/ACCURACY.md"

python tools/casia_scale_study.py $COMMON --heads full_softmax --use_fused on \
  --cls_dtype bfloat16 --mom_dtype bfloat16 --tag j20bf16mom --seed 1
python tools/casia_scale_study.py $COMMON --heads full_softmax --tag j20dense --seed 1
python tools/casia_scale_study.py $COMMON --heads full_softmax --use_fused on \
  --cls_dtype bfloat16 --mom_dtype float32 --tag j20fusedbf16cls
python tools/casia_scale_study.py $COMMON --heads full_softmax --tag j20dense --seed 2
python tools/casia_scale_study.py $COMMON --heads full_softmax --use_fused on \
  --cls_dtype float32 --mom_dtype float32 --tag j20fusedf32
echo "ADJUDICATION DONE"
