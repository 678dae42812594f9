#!/bin/bash
# Round-2 follow-up chip session: component profile, strong teacher (30k),
# distilled student against it. Sequential, with claim-release sleeps.
set -x
cd /root/repo
mkdir -p outputs/ab
python scripts/bench_components.py --trace > outputs/bench_components_r2.json 2> outputs/bench_components_r2.err
sleep 300
python scripts/train_synthetic_tpu.py --steps 30000 --batches 128 \
  --batch_size 16 --eval_n 128 --backbone darknet53 \
  --working_dir outputs/ab/teacher30k/ > outputs/ab/teacher30k.log 2>&1
sleep 300
python scripts/train_synthetic_tpu.py --steps 10000 --batches 64 \
  --batch_size 16 --eval_n 128 --backbone darknet_tiny_h \
  --kd_weight 5 --backbone_t darknet53 \
  --weight_file_t outputs/ab/teacher30k/final.ckpt \
  --working_dir outputs/ab/distilled2/ > outputs/ab/distilled2.log 2>&1
echo AB2-DONE
