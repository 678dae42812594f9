"""int8 post-training quantization A/B: accuracy + throughput vs float.

Same checkpoint, same eval data, three forwards:
  float   : the checkpoint as trained (BN live), production eval form
  folded  : BN folded into conv weights (the serving/teacher form)
  int8    : PTQ of the folded net (utils/quant) — per-channel int8 weights,
            per-conv static activation scales calibrated on the first
            --calib_batches eval batches (absmax)

Reports per-arm eval metrics (ADI/AUC/REP over --eval_n synthetic scenes)
and, on TPU, scan-chained forward latency (replay-immune, same methodology
as scripts/bench_components.py). Writes results/quant_ab.json.

Run (TPU):  python scripts/bench_quant.py
CPU smoke:  python scripts/bench_quant.py --cpu --eval_n 24 --batch 8 \
                --skip_timing
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weight_file", type=str,
                    default="outputs/s2d/tinyh_base_s0/final.ckpt")
    ap.add_argument("--backbone", type=str, default="darknet_tiny_h")
    ap.add_argument("--eval_n", type=int, default=384)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--calib_batches", type=int, default=4)
    ap.add_argument("--timing_batch", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip_timing", action="store_true")
    ap.add_argument("--out", type=str, default="results/quant_ab.json")
    args = ap.parse_args()

    import jax
    if args.cpu or os.environ.get("KD6D_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig, TestConfig
    from kd6d_pose_adlp_tpu.data.pipeline import collate
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine import evaluator
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
    from kd6d_pose_adlp_tpu.engine.steps import build_forward
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose
    from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    from kd6d_pose_adlp_tpu.utils.quant import quantize_posenet
    setup_compilation_cache()

    # same eval as the suite checkpoints were scored with
    # (scripts/eval_synthetic_ckpt.py: single-class synthetic scenes)
    cfg = Config(model=ModelConfig(backbone=args.backbone,
                                   compute_dtype="float32" if args.cpu else "bfloat16"),
                 test=TestConfig(ims_per_batch=args.batch))
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, mesh_diameters=tuple(np.asarray(consts.diameters))))
    meshes = [np.asarray(consts.kp3d[c]) for c in range(cfg.data.n_fg)]

    def eval_batch_list():
        out = []
        tb = cfg.test.ims_per_batch
        for start in range(0, args.eval_n, tb):
            idx = [min(start + k, args.eval_n - 1) for k in range(tb)]
            samples = [ds.sample(i, train=False) for i in idx]
            out.append((collate(samples), [
                dict(filename=f"synthetic_{i:06d}.png", K=s["meta"]["K"],
                     width=s["meta"]["width"], height=s["meta"]["height"],
                     class_ids=[s["meta"]["cls"]], rotations=[s["meta"]["R"]],
                     translations=[s["meta"]["T"]])
                for i, s in zip(idx, samples)]))
        return out

    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, cfg.model.input_res, cfg.model.input_res, 3)))
    variables, loaded = load_params_loose(args.weight_file, variables)
    print(f"loaded {loaded} tensors from {args.weight_file}", flush=True)

    # folded arm
    folded = fold_batchnorm(variables)
    cfg_f = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, bn_folded=True))
    net_f = PoseNet(cfg=cfg_f.model, n_fg=cfg.data.n_fg)

    # int8 arm: calibrate on the first batches' images
    batches = eval_batch_list()
    calib = [b.images for b, _ in batches[:args.calib_batches]]
    t0 = time.time()
    net_q, qvars = quantize_posenet(cfg_f.model, cfg.data.n_fg, folded, calib)
    print(f"quantized in {time.time() - t0:.1f}s "
          f"({len(jax.tree_util.tree_leaves(qvars['quant'])) // 4} convs)",
          flush=True)

    postprocess = build_postprocess(cfg, consts)

    def run_valid(fwd, vars_, tag):
        t0 = time.time()
        res = evaluator.valid(cfg, consts, jax.device_put(vars_), fwd,
                              postprocess, iter(batches), meshes,
                              verbose=False)
        dt = time.time() - t0
        out = {}
        for group, key in (("adi_per_class", "ADI.10d"), ("adi_per_class", "ADI.05d"),
                           ("auc_per_class", "AUC    "), ("rep_per_class", "REP05px")):
            vals = [acc[key] for acc in res[group] if key in acc]
            out[key.strip()] = round(float(np.mean(vals)), 3) if vals else None
        out["eval_wall_s"] = round(dt, 1)
        print(f"[{tag}] {out}", flush=True)
        return out

    results = {
        "weight_file": args.weight_file,
        "backbone": args.backbone,
        "eval_n": args.eval_n,
        "platform": jax.devices()[0].platform,
        "float": run_valid(build_forward(cfg, net), variables, "float"),
        "folded": run_valid(build_forward(cfg_f, net_f), folded, "folded"),
        "int8": run_valid(
            jax.jit(lambda v, im: net_q.apply(v, im, train=False)),
            qvars, "int8"),
    }

    if not args.skip_timing:
        # replay-immune chained forward timing (see bench_components.py)
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from bench_components import timeit

        def chained(apply_fn, k, x0):
            def prog(v, x):
                def body(c, _):
                    out = apply_fn(v, c)
                    bump = (out[0].mean() * 1e-6).astype(c.dtype)
                    return c + bump, None
                c, _ = jax.lax.scan(body, x, None, length=k)
                return c
            jitted = jax.jit(prog)
            carry = {"x": x0}

            def call(v):
                carry["x"] = jitted(v, carry["x"])
                return carry["x"]
            return call

        B = args.timing_batch
        x0 = jnp.asarray(np.random.default_rng(0).normal(
            size=(B, cfg.model.input_res, cfg.model.input_res, 3)),
            jnp.float32)
        K = 16
        timing = {}
        for tag, n_, v_ in (("folded", net_f, folded), ("int8", net_q, qvars)):
            call = chained(lambda v, x, n_=n_: n_.apply(v, x, train=False),
                           K, x0)
            t = timeit(call, jax.device_put(v_)) / K
            timing[tag] = {"ms_per_batch": round(t * 1e3, 3),
                           "img_per_s": round(B / t, 1),
                           "spread": timeit.last_spread}
            print(f"[timing {tag}] {timing[tag]}", flush=True)
        if timing["int8"]["ms_per_batch"] > 0:
            timing["speedup"] = round(timing["folded"]["ms_per_batch"]
                                      / timing["int8"]["ms_per_batch"], 3)
        results["timing"] = timing

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"quant_ab": results.get("timing", {}),
                      "adi10_float": results["float"]["ADI.10d"],
                      "adi10_int8": results["int8"]["ADI.10d"]}))


if __name__ == "__main__":
    main()
