#!/bin/bash
# Distillation A/B on synthetic data @256 on the TPU (VERDICT r1 item 3).
# Sequential: the chip allows one process; sleep between runs for the claim.
set -x
cd /root/repo
mkdir -p outputs/ab
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet53 \
  --working_dir outputs/ab/teacher/ > outputs/ab/teacher.log 2>&1
sleep 300
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --working_dir outputs/ab/baseline/ > outputs/ab/baseline.log 2>&1
sleep 300
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 5 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher/final.ckpt \
  --working_dir outputs/ab/distilled/ > outputs/ab/distilled.log 2>&1
echo AB-DONE
