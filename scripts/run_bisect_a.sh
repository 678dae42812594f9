#!/bin/bash
# Bisect run A: full tree at 5a2f6dc (pre bf16-norms, pre maxpool-rewrite),
# host loop + pinned pool, identical args to the round-2 A/B baseline.
# Expect ~51 ADI.10d if the regression is in 306ae29/28dcb34.
set -x
cd /root/repo

# wait for the eval-bisect chain to release the chip
while ! grep -q EVAL-BISECT-DONE results/eval_bisect.log 2>/dev/null; do
  sleep 30
done
sleep 240

cd /root/repo/.bisect_a
KD6D_JAX_CACHE=/root/repo/.jax_cache python scripts/train_synthetic_tpu.py \
  --steps 10000 --batches 64 --batch_size 16 --eval_n 128 \
  --backbone darknet_tiny_h \
  --working_dir /root/repo/outputs/ab/baseline_bisect_a/ \
  > /root/repo/results/ab_baseline_bisect_a.log 2>&1
echo BISECT-A-DONE
