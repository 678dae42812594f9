#!/bin/bash
# Eval-code bisect: re-score the freshly trained student (and the teacher)
# under HEAD eval vs pre-ea0a391 (CustomCall linalg) eval. Restores files.
set -x
cd /root/repo
mkdir -p results

sleep 180
python scripts/eval_synthetic_ckpt.py outputs/ab/baseline_hostloop/final.ckpt \
  --backbone darknet_tiny_h --eval_n 128 --working_dir outputs/evalbisect/head_student \
  > results/eval_head_student.log 2>&1
sleep 240

git checkout ea0a391^ -- kd6d_pose_adlp_tpu/ops/epnp.py kd6d_pose_adlp_tpu/engine/postprocess.py
trap 'git checkout HEAD -- kd6d_pose_adlp_tpu/ops/epnp.py kd6d_pose_adlp_tpu/engine/postprocess.py' EXIT

python scripts/eval_synthetic_ckpt.py outputs/ab/baseline_hostloop/final.ckpt \
  --backbone darknet_tiny_h --eval_n 128 --working_dir outputs/evalbisect/old_student \
  > results/eval_oldpnp_student.log 2>&1
sleep 240

python scripts/eval_synthetic_ckpt.py outputs/ab/teacher30k/final.ckpt \
  --backbone darknet53 --eval_n 128 --working_dir outputs/evalbisect/old_teacher \
  > results/eval_oldpnp_teacher.log 2>&1

echo EVAL-BISECT-DONE
