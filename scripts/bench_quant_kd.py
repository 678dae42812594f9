"""int8 teacher in the live-teacher KD step: throughput + knowledge fidelity.

The frozen darknet53 teacher forward is ~70% of the KD step's FLOPs
(BASELINE.md). `--cache_teacher` removes it entirely for static pools;
this measures the OTHER lever — `--quant_teacher` — which keeps the
teacher live (required for the BOP path's per-epoch DZI re-crops) but runs
its convs int8 on the MXU (2x bf16 peak on v5e).

Arms (same synthetic data, same student state):
  folded : BN-folded bf16 teacher (the production live-teacher form)
  int8   : PTQ teacher (utils/quant, calibrated on the timing pool)

Measured per batch size: chained teacher forward (replay-immune scan, like
scripts/bench_components.py), the full KD multi-step (K steps, state
threading), and teacher-knowledge fidelity int8-vs-folded on one batch
(voted-cell agreement + mean |kp2d delta| — what the KD loss actually
consumes). Writes results/quant_kd_ab.json.

Run (TPU):  python scripts/bench_quant_kd.py
CPU smoke:  python scripts/bench_quant_kd.py --cpu --batches 2 --res 64
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
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", type=str,
                    default="outputs/pretrain2/teacher30k_pt/final.ckpt")
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 64])
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--k_steps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="results/quant_kd_ab.json")
    args = ap.parse_args()

    import jax
    if args.cpu or os.environ.get("KD6D_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.steps import (build_multi_step,
                                                 create_train_state,
                                                 make_optimizer, teacher_votes)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose
    from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    from kd6d_pose_adlp_tpu.utils.quant import quantize_posenet
    from bench_components import timeit

    setup_compilation_cache()
    dtype = "float32" if args.cpu else "bfloat16"
    results = {"platform": jax.devices()[0].platform,
               "teacher": args.teacher, "k_steps": args.k_steps}

    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h",
                                   compute_dtype=dtype, input_res=args.res,
                                   use_higher_levels=args.res >= 128))
    cfg_t = Config(model=ModelConfig(backbone="darknet53",
                                     compute_dtype=dtype, input_res=args.res,
                                     use_higher_levels=args.res >= 128))
    n_fg = cfg.data.n_fg
    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=args.res, max_objs=8,
                              single_class=0, seed=0)
    consts = ds.consts()

    tnet = PoseNet(cfg=cfg_t.model, n_fg=n_fg)
    t_init = tnet.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, args.res, args.res, 3)))
    t_init, n = load_params_loose(args.teacher, t_init)
    print(f"teacher: loaded {n} tensors from {args.teacher}", flush=True)

    # folded arm
    folded = fold_batchnorm(t_init)
    cfg_tf = cfg_t.replace(model=dataclasses.replace(cfg_t.model,
                                                     bn_folded=True))
    tnet_f = PoseNet(cfg=cfg_tf.model, n_fg=n_fg)

    # int8 arm: calibrate on the first timing batch
    calib_batch = ds.batch(range(max(args.batches)), train=True)
    t0 = time.time()
    tnet_q, tvars_q = quantize_posenet(cfg_tf.model, n_fg, folded,
                                       [calib_batch.images])
    cfg_tq = cfg_tf.replace(model=dataclasses.replace(
        cfg_tf.model, quant_mode="quant"))
    print(f"teacher quantized in {time.time() - t0:.1f}s", flush=True)

    folded = jax.device_put(folded)
    tvars_q = jax.device_put(tvars_q)

    # knowledge fidelity: do the voted cells / keypoints the KD loss eats
    # change when the teacher goes int8?
    batch_fid = jax.device_put(ds.batch(range(16), train=True))
    v_f = jax.device_get(teacher_votes(cfg, cfg_tf, tnet_f, folded, batch_fid))
    v_q = jax.device_get(teacher_votes(cfg, cfg_tq, tnet_q, tvars_q, batch_fid))
    val_f = np.asarray(v_f.valid, bool)
    val_q = np.asarray(v_q.valid, bool)
    both = val_f & val_q
    agree = float((val_f == val_q).mean())
    kp_d = float(np.abs(np.asarray(v_q.kp2d)[both]
                        - np.asarray(v_f.kp2d)[both]).mean()) if both.any() else None
    w_d = float(np.abs(np.asarray(v_q.score)[both]
                       - np.asarray(v_f.score)[both]).mean()) if both.any() else None
    results["knowledge_fidelity"] = {
        "valid_cells_folded": int(val_f.sum()),
        "valid_cells_int8": int(val_q.sum()),
        "cell_agreement": round(agree, 4),
        "mean_abs_kp2d_delta_px": round(kp_d, 4) if kp_d is not None else None,
        "mean_abs_score_delta": round(w_d, 5) if w_d is not None else None,
    }
    print(f"knowledge fidelity: {results['knowledge_fidelity']}", flush=True)

    def chained_fwd(net_, k, x0):
        def prog(v, x):
            def body(c, _):
                out = net_.apply(v, c, train=False)
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

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    opt = make_optimizer(cfg)
    K = args.k_steps

    for bs in args.batches:
        batch = jax.device_put(ds.batch(range(bs), train=True))
        pool1 = jax.tree_util.tree_map(lambda x: x[None], batch)
        row = {}
        for tag, tn, cfg_tt, tv in (("folded", tnet_f, cfg_tf, folded),
                                    ("int8", tnet_q, cfg_tq, tvars_q)):
            kf = 4 if args.cpu else 32
            t_f = timeit(chained_fwd(tn, kf, batch.images), tv,
                         n=1 if args.cpu else 20,
                         warmup=1 if args.cpu else 5) / kf
            multi = jax.jit(
                build_multi_step(cfg, cfg_tt, consts, net, tn, opt,
                                 distill=True, pool_size=1),
                donate_argnums=(0,), static_argnums=(5,))
            carry = {"s": create_train_state(jax.random.PRNGKey(0), cfg,
                                             net, opt),
                     "r": jax.random.PRNGKey(2)}

            def call():
                s, r, m = multi(carry["s"], tv, pool1, carry["r"],
                                jnp.zeros((), jnp.int32), K)
                carry["s"], carry["r"] = s, r
                return m["loss_total"]

            t_s = timeit(call, n=1 if args.cpu else 10,
                         warmup=1 if args.cpu else 3) / K
            row[tag] = {"teacher_fwd_ms": round(1e3 * t_f, 3),
                        "teacher_fwd_img_s": round(bs / t_f, 1),
                        "kd_step_ms": round(1e3 * t_s, 3),
                        "kd_step_img_s": round(bs / t_s, 1),
                        "final_loss": float(jax.device_get(call()))}
            print(f"[bs{bs} {tag}] {row[tag]}", flush=True)
        row["teacher_fwd_speedup"] = round(
            row["folded"]["teacher_fwd_ms"] / row["int8"]["teacher_fwd_ms"], 3)
        row["kd_step_speedup"] = round(
            row["folded"]["kd_step_ms"] / row["int8"]["kd_step_ms"], 3)
        results[f"bs{bs}"] = row
        print(f"[bs{bs}] teacher fwd {row['teacher_fwd_speedup']}x, "
              f"KD step {row['kd_step_speedup']}x", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
