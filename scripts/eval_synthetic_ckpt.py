"""Eval-only: load a final.ckpt and run the synthetic held-out eval.

Mirrors scripts/train_synthetic_tpu.py's eval_fn so a checkpoint can be
re-scored under different eval-code versions (PnP regressions, knob sweeps)
without retraining.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", type=str, help="final.ckpt (params+batch_stats)")
    ap.add_argument("--backbone", type=str, default="darknet_tiny_h")
    ap.add_argument("--eval_n", type=int, default=128)
    ap.add_argument("--eval_offset", type=int, default=0,
                    help="first eval scene index (score disjoint ranges)")
    ap.add_argument("--input_res", type=int, default=256)
    ap.add_argument("--working_dir", type=str, default="outputs/eval_ckpt/")
    ap.add_argument("--classes", type=str, default="",
                    help="eval-class subset like train_synthetic_tpu "
                         "--classes ('0-14', '1,2'); empty = single class 0")
    ap.add_argument("--eval_mode", type=str, default="stream",
                    choices=["stream", "scan"],
                    help="stream = evaluator.valid (the host oracle path); "
                         "scan = engine/eval_scan one-dispatch evaluator")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine import evaluator
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
    from kd6d_pose_adlp_tpu.engine.steps import build_forward
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose

    dtype = "bfloat16" if not args.cpu else "float32"
    cfg = Config(model=ModelConfig(backbone=args.backbone, compute_dtype=dtype,
                                   input_res=args.input_res))
    classes = None
    if args.classes:
        if "-" in args.classes and "," not in args.classes:
            lo, hi = args.classes.split("-")
            classes = tuple(range(int(lo), int(hi) + 1))
        else:
            classes = tuple(int(c) for c in args.classes.split(","))
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=args.input_res,
                              max_objs=cfg.solver.max_objs,
                              single_class=None if classes else 0,
                              classes=classes, seed=0)
    consts = ds.consts()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, mesh_diameters=tuple(np.asarray(consts.diameters))))
    meshes = [np.asarray(consts.kp3d[c]) for c in range(cfg.data.n_fg)]

    def eval_batches():
        from kd6d_pose_adlp_tpu.data.pipeline import collate
        tb = cfg.test.ims_per_batch
        o = args.eval_offset
        for start in range(o, o + args.eval_n, tb):
            idx = [min(start + k, o + args.eval_n - 1) for k in range(tb)]
            samples = [ds.sample(i, train=False) for i in idx]
            yield collate(samples), [
                dict(filename=f"synthetic_{i:06d}.png", K=s["meta"]["K"],
                     width=s["meta"]["width"], height=s["meta"]["height"],
                     class_ids=[s["meta"]["cls"]], rotations=[s["meta"]["R"]],
                     translations=[s["meta"]["T"]])
                for i, s in zip(idx, samples)]

    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    forward = build_forward(cfg, net)
    postprocess = build_postprocess(cfg, consts)
    init = net.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, args.input_res, args.input_res, 3)))
    variables, n = load_params_loose(args.ckpt, init)
    print(f"loaded {n} tensors from {args.ckpt}", flush=True)

    if args.eval_mode == "scan":
        from kd6d_pose_adlp_tpu.engine.eval_scan import ScanEvaluator
        sev = ScanEvaluator(cfg, consts, net, meshes).prepare(eval_batches())
        res = sev.run(variables, step=0, working_dir=args.working_dir)
    else:
        res = evaluator.valid(cfg, consts, variables, forward, postprocess,
                              eval_batches(), meshes, step=0,
                              working_dir=args.working_dir)

    def avg(group, key):
        vals = [a.get(key) for a in res[group] if a and key in a]
        return round(float(np.mean(vals)), 2) if vals else 0.0

    out = {k: avg(g, k) for g, k in [
        ("adi_per_class", "ADI.05d"), ("adi_per_class", "ADI.10d"),
        ("adi_per_class", "ADI.20d"), ("rep_per_class", "REP02px"),
        ("rep_per_class", "REP05px"), ("rep_per_class", "REP10px"),
        ("rep_per_class", "REP20px")]}
    print(json.dumps({"ckpt": args.ckpt, **out}))


if __name__ == "__main__":
    main()
