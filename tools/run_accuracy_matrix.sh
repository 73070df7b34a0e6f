#!/bin/bash
# Round-4 fidelity matrix on the DISCRIMINATIVE store (coef_jitter=0.2,
# Bayes-optimal verification ceiling ~0.94 — data/synthetic.py): re-runs
# every perf-feature row at an operating point where a regression is
# visible (round-3 verdict item 3). Sequential — ONE chip, one host core.
# Usage: nohup bash tools/run_accuracy_matrix.sh > /tmp/casia_j20.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
STORE=/root/casia_syn_j20
COMMON="--store $STORE --coef_jitter 0.2 --ids 10500 --images_per_id 12 --epochs 2 --out docs/ACCURACY.md"

# 1. dense f32 full softmax — the control that calibrates the operating point
python tools/casia_scale_study.py $COMMON --heads full_softmax --tag j20dense
# 2. FFC dense f32 — the flagship claim (clean end-to-end run; round-3
#    verdict weak #3 asked for a re-run with real loss/train_seconds)
python tools/casia_scale_study.py $COMMON --heads ffc --tag j20
# 2b. FFC fused f32 — the streaming-kernel control the int8 rows diff against
python tools/casia_scale_study.py $COMMON --heads ffc --use_fused on --tag j20fused
# 3. int8-stored queue
python tools/casia_scale_study.py $COMMON --heads ffc --use_fused on \
  --queue_dtype int8 --tag j20int8q
# 4. int8 compute on top
python tools/casia_scale_study.py $COMMON --heads ffc --use_fused on \
  --queue_dtype int8 --int8_compute --tag j20int8c
# 5. the bench softmax row's storage dtypes: fused bf16 classifier+momentum
python tools/casia_scale_study.py $COMMON --heads full_softmax --use_fused on \
  --cls_dtype bfloat16 --mom_dtype bfloat16 --tag j20bf16mom
# 6. ir50 + int8 queue + int8 compute — the capacity bench row's exact
#    feature combination (round-3 verdict weak #6)
python tools/casia_scale_study.py $COMMON --heads ffc --net ir50 \
  --use_fused on --queue_dtype int8 --int8_compute --tag j20ir50int8c
echo "MATRIX DONE"
