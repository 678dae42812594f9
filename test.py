"""Evaluation driver (CLI) — reference `test.py` equivalent.

Loads a checkpoint (final.ckpt / latest.ckpt, loose loading) and evaluates on
the configured test split; prints the per-class ADD/ADI/AUC/REP table and
writes preds.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", type=str, default="./configs/ape.yaml")
    p.add_argument("--backbone", type=str, default="darknet_tiny_h")
    p.add_argument("--weight_file", type=str, required=True)
    p.add_argument("--test_file", type=str, default="")
    p.add_argument("--working_dir", type=str, default="./outputs/eval/")
    p.add_argument("--data", type=str, default="bop", choices=["bop", "synthetic"])
    p.add_argument("--ims_per_batch", type=int, default=24)  # reference test.py:114
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--eval_mode", type=str, default="scan",
                   choices=["scan", "stream"],
                   help="scan = one-dispatch evaluator with device-side "
                        "remap+metrics (engine/eval_scan); stream = "
                        "per-batch evaluator.valid (the oracle path)")
    p.add_argument("--eval_all_classes", action="store_true",
                   help="also run detection-style eval over every class "
                        "(recovery rate / false positives / ADI rate)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (also via KD6D_CPU=1); see "
                        "train_kd.py --cpu")
    p.add_argument("--fast_pipeline", action="store_true",
                   help="single-warp host data path (see train_kd.py)")
    args = p.parse_args()

    import jax
    if args.cpu or os.environ.get("KD6D_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()

    from kd6d_pose_adlp_tpu.config import load_yaml_config
    from kd6d_pose_adlp_tpu.data import loaders
    from kd6d_pose_adlp_tpu.engine import evaluator
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
    from kd6d_pose_adlp_tpu.engine.steps import build_forward
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose

    if not os.path.exists(args.weight_file):
        raise SystemExit(f"error: --weight_file not found: {args.weight_file}")

    cfg = load_yaml_config(args.config_file, backbone=args.backbone)
    if args.test_file:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, test_list=args.test_file,
                                                   valid_list=args.test_file))
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype=args.compute_dtype),
        test=dataclasses.replace(cfg.test, ims_per_batch=args.ims_per_batch),
        data=dataclasses.replace(cfg.data, fast_pipeline=args.fast_pipeline))

    data = loaders.build(cfg, kind=args.data)
    if data.cfg is not None:
        cfg = data.cfg
    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, cfg.model.input_res, cfg.model.input_res, 3)))
    variables, n = load_params_loose(args.weight_file, variables)
    print(f"loaded {n} tensors from {args.weight_file}")

    if args.eval_mode == "scan":
        from kd6d_pose_adlp_tpu.engine.eval_scan import ScanEvaluator
        sev = ScanEvaluator(cfg, data.consts, net, data.meshes)
        sev.prepare(data.eval_batches())
        sev.run(variables, step=0, working_dir=args.working_dir)
    else:
        forward = build_forward(cfg, net)
        postprocess = build_postprocess(cfg, data.consts)
        evaluator.valid(cfg, data.consts, variables, forward, postprocess,
                        data.eval_batches(), data.meshes, step=0,
                        working_dir=args.working_dir)
    if args.eval_all_classes:
        evaluator.detection_stats(cfg, data.consts, variables,
                                  build_forward(cfg, net),
                                  data.eval_batches(), n_fg=cfg.data.n_fg)


if __name__ == "__main__":
    main()
