"""Train + eval the dense binary-code (ZebraPose-style) head on synthetic
data — the feasibility probe for BASELINE.json configs[5].

Protocol mirrors scripts/train_synthetic_tpu.py (device-resident batch
pool, K steps per dispatch, held-out eval) but swaps the 8-corner keypoint
pipeline for the dense-correspondence one (engine/zebra): per positive
cell the head regresses a 16-bit hierarchical surface code + 2D offset;
eval decodes the top-K cells into 2D-3D correspondences and solves
RANSAC-EPnP(+LHM) over them, entirely on device.

Dense KD: --weight_file_t (a zebra checkpoint of the teacher backbone)
distills the teacher's per-cell code probabilities into the student with
confidence-weighted soft BCE.

Run (chip):   python scripts/train_zebra.py --steps 2000
CPU smoke:    python scripts/train_zebra.py --cpu --steps 4 --batches 2 \
                  --batch_size 2 --input_res 128 --eval_n 4 --code_bits 8
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--schedule_steps", type=int, default=0,
                    help="OneCycle length (default: --steps). The schedule "
                         "length is baked into the compiled program as "
                         "constants, so reusing one value across runs of "
                         "different --steps hits the compilation cache "
                         "(the 10k run on 2026-08-20 spent >24 min in a "
                         "fresh remote compile for exactly this reason)")
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--working_dir", type=str, default="outputs/zebra/")
    ap.add_argument("--eval_n", type=int, default=64)
    ap.add_argument("--input_res", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--backbone", type=str, default="darknet_tiny_h")
    ap.add_argument("--code_bits", type=int, default=16)
    ap.add_argument("--verts_per_axis", type=int, default=6)
    ap.add_argument("--classes", type=str, default="",
                    help="class subset like train_synthetic_tpu; empty = "
                         "single class 0")
    ap.add_argument("--kd_weight", type=float, default=0.0)
    ap.add_argument("--weight_file_t", type=str, default="",
                    help="zebra teacher final.ckpt (same code_bits); with "
                         "kd_weight>0 enables dense code distillation")
    ap.add_argument("--backbone_t", type=str, default="darknet53")
    ap.add_argument("--backbone_init", type=str, default="",
                    help="warm-start the student backbone from a (corner- "
                         "or zebra-) checkpoint; head/FPN stay fresh")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps_per_dispatch", type=int, default=50)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    return ap


def main():
    args = build_parser().parse_args()
    out = run(args)
    print(json.dumps(out))


def run(args):
    import dataclasses

    import jax

    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig, SolverConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.steps import (create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.engine.zebra import (build_zebra_multi_step,
                                                 build_zebra_postprocess,
                                                 build_zebra_train_step)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils import metrics as M

    dtype = "bfloat16" if not args.cpu else "float32"
    cfg = Config(
        model=ModelConfig(backbone=args.backbone, compute_dtype=dtype,
                          input_res=args.input_res, code_bits=args.code_bits),
        solver=SolverConfig(ims_per_batch=args.batch_size,
                            max_iter=args.schedule_steps or args.steps,
                            base_lr=args.lr, seed=args.seed),
        kd=KDConfig(weight=args.kd_weight),
    )
    classes = None
    if args.classes:
        if "-" in args.classes and "," not in args.classes:
            lo, hi = args.classes.split("-")
            classes = tuple(range(int(lo), int(hi) + 1))
        else:
            classes = tuple(int(c) for c in args.classes.split(","))
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs,
                              single_class=None if classes else 0,
                              classes=classes, seed=0)
    consts = ds.consts(code_bits=args.code_bits,
                       verts_per_axis=args.verts_per_axis)
    n_fg = cfg.data.n_fg
    print(f"verts/class: {consts.verts.shape[1]}, code bits: {args.code_bits}",
          flush=True)

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    optimizer = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(args.seed), cfg, net,
                               optimizer)
    if args.backbone_init:
        from kd6d_pose_adlp_tpu.utils.checkpoint import load_backbone_init
        params, stats, n = load_backbone_init(args.backbone_init,
                                              state.params, state.batch_stats)
        state = state._replace(params=params, batch_stats=stats)
        print(f"student backbone warm-started: {n} tensors", flush=True)

    teacher_vars, teacher_net, distill = None, None, False
    if args.weight_file_t and args.kd_weight > 0:
        from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose
        t_model = ModelConfig(backbone=args.backbone_t, compute_dtype=dtype,
                              input_res=args.input_res,
                              code_bits=args.code_bits)
        teacher_net = PoseNet(cfg=t_model, n_fg=n_fg)
        t_init = teacher_net.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, args.input_res, args.input_res, 3)))
        teacher_vars, n = load_params_loose(args.weight_file_t, t_init)
        teacher_vars = jax.device_put(teacher_vars)
        distill = True
        print(f"zebra teacher: loaded {n} tensors", flush=True)

    print("pre-rendering train pool...", flush=True)
    t0 = time.time()
    host = [ds.batch(range(1000 + b * args.batch_size,
                           1000 + (b + 1) * args.batch_size), train=True)
            for b in range(args.batches)]
    host = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *host)
    pool = jax.device_put(host)
    print(f"pool of {args.batches} batches in {time.time()-t0:.0f}s",
          flush=True)

    k = max(1, min(args.steps_per_dispatch or 1, args.steps))
    multi = jax.jit(
        build_zebra_multi_step(cfg, consts, net, teacher_net, optimizer,
                               n_fg, pool_size=args.batches, distill=distill),
        donate_argnums=(0,), static_argnums=(5,))
    rng = jax.random.PRNGKey(args.seed + 17)
    done, t0, imgs = 0, time.time(), 0
    while done < args.steps:
        kk = min(k, args.steps - done)
        state, rng, m = multi(state, teacher_vars, pool, rng,
                              jnp.asarray(done % args.batches, jnp.int32), kk)
        done += kk
        imgs += kk * args.batch_size
        if done % max(args.log_every, kk) == 0 or done >= args.steps:
            m = jax.device_get(m)
            print(f"step {done}/{args.steps} cls {m['loss_cls']:.4f} "
                  f"code {m['loss_code']:.3f} off {m['loss_off']:.3f} "
                  f"kd {m['loss_kd']:.3f} npos {int(m['num_pos'])} "
                  f"ips {imgs/(time.time()-t0):.1f}", flush=True)

    os.makedirs(args.working_dir, exist_ok=True)
    from kd6d_pose_adlp_tpu.utils.checkpoint import save_params
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save_params(os.path.join(args.working_dir, "final.ckpt"), variables)

    # --- held-out eval: decode dense correspondences -> poses -> ADD/REP
    postprocess = build_zebra_postprocess(cfg, consts, n_fg)

    @jax.jit
    def fwd(v, images):
        return net.apply(v, images, train=False)

    errs3, errs2, gt_cls_all, valid_all = [], [], [], []
    tb = cfg.test.ims_per_batch
    erng = jax.random.PRNGKey(123)
    for start in range(0, args.eval_n, tb):
        idx = [min(start + j, args.eval_n - 1) for j in range(tb)]
        batch = ds.batch(idx, train=False)
        cls_l, _, code_p = fwd(variables, batch.images)
        erng, sub = jax.random.split(erng)
        out = jax.device_get(postprocess(cls_l, code_p, batch, sub))
        take = len(set(idx))  # last batch pads by repeating the final index
        for i in range(take):
            ci = int(np.asarray(batch.class_ids)[i, 0])
            gtR = np.asarray(batch.rotations)[i, 0]
            gtT = np.asarray(batch.translations)[i, 0]
            e3, e2 = M.compute_pose_diff(
                np.asarray(consts.verts[ci]), np.asarray(consts.K),
                gtR, gtT.reshape(3, 1),
                np.asarray(out["R"][i]), np.asarray(out["T"][i]).reshape(3, 1))
            errs3.append(e3)
            errs2.append(e2)
            gt_cls_all.append(ci)
            valid_all.append(bool(out["valid"][i]))

    errs3, errs2 = np.asarray(errs3), np.asarray(errs2)
    valid = np.asarray(valid_all)
    diam = np.asarray(jax.device_get(consts.diameters))[np.asarray(gt_cls_all)]
    ok = valid & np.isfinite(errs3)
    res = {
        "ADD.10d": round(100.0 * float(np.mean(ok & (errs3 <= 0.1 * diam))), 2),
        "ADD.20d": round(100.0 * float(np.mean(ok & (errs3 <= 0.2 * diam))), 2),
        "REP05px": round(100.0 * float(np.mean(ok & (errs2 <= 5.0))), 2),
        "REP10px": round(100.0 * float(np.mean(ok & (errs2 <= 10.0))), 2),
        "mean_err3d_mm": round(float(np.mean(errs3[ok])) if ok.any() else -1.0, 2),
        "n_valid": int(valid.sum()), "n_eval": int(len(valid)),
    }
    print(json.dumps(res), flush=True)
    return {"final": res, "backbone": args.backbone, "steps": args.steps,
            "code_bits": args.code_bits, "kd_weight": args.kd_weight}


if __name__ == "__main__":
    main()
