#!/bin/bash
# KD ablations after distilled2 < baseline: re-pin baseline on current code,
# isolate the Pallas gradient path, and a weaker kd_weight.
set -x
cd /root/repo
mkdir -p outputs/ab
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --working_dir outputs/ab/baseline_v2/ > outputs/ab/baseline_v2.log 2>&1
sleep 300
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 5 --use_pallas 0 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled_jax/ > outputs/ab/distilled_jax.log 2>&1
sleep 300
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled_w1/ > outputs/ab/distilled_w1.log 2>&1
echo AB3-DONE
