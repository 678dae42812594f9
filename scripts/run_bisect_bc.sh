#!/bin/bash
# Bisect runs B (old tree + reshape-maxpool only) and C (old tree + bf16
# norms only), vs A's exact round-2 reproduction (ADI.10d 51.56).
set -x
cd /root/repo

while ! grep -q BISECT-A-DONE results/bisect_a_chain.log 2>/dev/null; do
  sleep 30
done
sleep 240

cd /root/repo/.bisect_b
KD6D_JAX_CACHE=/root/repo/.jax_cache python scripts/train_synthetic_tpu.py \
  --steps 10000 --batches 64 --batch_size 16 --eval_n 128 \
  --backbone darknet_tiny_h \
  --working_dir /root/repo/outputs/ab/baseline_bisect_b/ \
  > /root/repo/results/ab_baseline_bisect_b.log 2>&1
sleep 240

cd /root/repo/.bisect_c
KD6D_JAX_CACHE=/root/repo/.jax_cache python scripts/train_synthetic_tpu.py \
  --steps 10000 --batches 64 --batch_size 16 --eval_n 128 \
  --backbone darknet_tiny_h \
  --working_dir /root/repo/outputs/ab/baseline_bisect_c/ \
  > /root/repo/results/ab_baseline_bisect_c.log 2>&1

echo BISECT-BC-DONE
