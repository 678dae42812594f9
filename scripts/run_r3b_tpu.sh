#!/bin/bash
# Round-3 chip chain, part B: restart of the training chain after pinning the
# pre-rendered pool on device (part A's teacher ran transfer-bound at
# 74 img/s through the tunnel). bench + components already recorded by
# run_r3_tpu.sh.
set -x
cd /root/repo
mkdir -p outputs/ab results

python scripts/train_synthetic_tpu.py --steps 30000 --batches 128 \
  --batch_size 16 --eval_n 128 --backbone darknet53 \
  --working_dir outputs/ab/teacher30k/ > results/ab_teacher30k.log 2>&1
sleep 300

python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --working_dir outputs/ab/baseline_v3/ > results/ab_baseline.log 2>&1
sleep 300

python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled_w1/ > results/ab_distilled_w1.log 2>&1
sleep 300

python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --weighted_ot 0 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/ablate_wot0/ > results/ab_wot0.log 2>&1
sleep 300

python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --gtype energy --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/ablate_energy/ > results/ab_energy.log 2>&1
sleep 300

python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --reach 0 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/ablate_balanced/ > results/ab_balanced.log 2>&1
sleep 300

# seed repeat of the headline pair
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h --seed 1 \
  --working_dir outputs/ab/baseline_s1/ > results/ab_baseline_s1.log 2>&1
sleep 300
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h --seed 1 \
  --kd_weight 1 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled_w1_s1/ > results/ab_distilled_w1_s1.log 2>&1
sleep 300

# final perf evidence on the post-BN/maxpool code: components + headline bench
python scripts/bench_components.py > results/bench_components_r3b.json \
  2> results/bench_components_r3b.err
sleep 300
python bench.py > results/bench_r3_final.json 2> results/bench_r3_final.err

echo R3B-CHAIN-DONE
