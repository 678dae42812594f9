#!/bin/bash
# The reference's three documented runs (reference train.sh:1-9), mapped to
# this framework. Assumes LINEMOD in BOP layout under ./data/linemod/.

# 1) student baseline (no distillation)
python train_kd.py --config_file configs/ape.yaml --backbone darknet_tiny_h \
    --kd_weight 0 --max_iters 10000 \
    --working_dir outputs/linemod/ape_student_baseline/ 2>&1 | tee outputs/ape_baseline.log

# 2) distilled student (ours): sinkhorn OT, weighted, kd_weight 5
python train_kd.py --config_file configs/ape.yaml --backbone darknet_tiny_h \
    --backbone_t darknet53 --weight_file_t outputs/linemod/ape_teacher/final.ckpt \
    --kd_weight 5 --gtype sinkhorn --p 2.0 --blur 0.001 --scaling 0.5 --reach 0.5 \
    --weightedOT true --max_iters 10000 \
    --working_dir outputs/linemod/ape_kd/ 2>&1 | tee outputs/ape_kd.log

# 3) teacher
python train_kd.py --config_file configs/ape.yaml --backbone darknet53 \
    --kd_weight 0 --max_iters 20000 \
    --working_dir outputs/linemod/ape_teacher/ 2>&1 | tee outputs/ape_teacher.log
