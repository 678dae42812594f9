#!/bin/bash
# Round-3 chain C: the distillation A/B + ablations on the FIXED code
# (post-regression-bisect), scan loop for speed. Assumes the teacher at
# outputs/ab/teacher30k/final.ckpt (ADI.10d 67.19) and a fresh baseline
# trained by this same chain.
set -x
cd /root/repo
mkdir -p outputs/ab results

# 1. baseline (kd 0)
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --working_dir outputs/ab/baseline_v4/ > results/ab_baseline_v4.log 2>&1
sleep 240

# 2. headline distillation (kd_weight 1, strong teacher)
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled_w1_v4/ > results/ab_distilled_w1.log 2>&1
sleep 240

# 3. ablation: unweighted OT
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --weighted_ot 0 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/ablate_wot0/ > results/ab_wot0.log 2>&1
sleep 240

# 4. ablation: energy kernel instead of sinkhorn
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --gtype energy --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/ablate_energy/ > results/ab_energy.log 2>&1
sleep 240

# 5. ablation: balanced OT (reach off)
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 1 --reach 0 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/ablate_balanced/ > results/ab_balanced.log 2>&1
sleep 240

# 6-7. seed repeat of the headline pair
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h --seed 1 \
  --working_dir outputs/ab/baseline_s1/ > results/ab_baseline_s1.log 2>&1
sleep 240
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h --seed 1 \
  --kd_weight 1 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled_w1_s1/ > results/ab_distilled_w1_s1.log 2>&1
sleep 240

# 8. final perf evidence on the fixed code
python scripts/bench_components.py > results/bench_components_final.json \
  2> results/bench_components_final.err
sleep 240
python bench.py > results/bench_final.json 2> results/bench_final.err

echo R3C-CHAIN-DONE
