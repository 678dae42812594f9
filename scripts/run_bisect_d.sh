#!/bin/bash
# Bisect run D: the seed-variance control — old (5a2f6dc) tree, seed 1.
# If old-tree seed-1 lands ~50 the healthy code is robust to seeds and the
# B/C perturbation collapses are real regressions; if it lands ~35 the
# endpoint itself is high-variance and the benchmark needs redesign.
set -x
cd /root/repo

while ! grep -q BISECT-BC-DONE results/bisect_bc_chain.log 2>/dev/null; do
  sleep 30
done
sleep 240

cd /root/repo/.bisect_a
KD6D_JAX_CACHE=/root/repo/.jax_cache python scripts/train_synthetic_tpu.py \
  --steps 10000 --batches 64 --batch_size 16 --eval_n 128 \
  --backbone darknet_tiny_h --seed 1 \
  --working_dir /root/repo/outputs/ab/baseline_old_s1/ \
  > /root/repo/results/ab_baseline_old_s1.log 2>&1
echo BISECT-D-DONE
