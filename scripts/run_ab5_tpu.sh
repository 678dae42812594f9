#!/bin/bash
# Seed repeats of the headline A/B (baseline vs kd_weight 1) + final bench.
set -x
cd /root/repo
mkdir -p outputs/ab
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h --seed 1 \
  --working_dir outputs/ab/baseline_s1/ > outputs/ab/baseline_s1.log 2>&1
sleep 300
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h --seed 1 \
  --kd_weight 1 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled_w1_s1/ > outputs/ab/distilled_w1_s1.log 2>&1
sleep 300
python bench.py > outputs/bench_r2_final.log 2>&1
echo AB5-DONE
