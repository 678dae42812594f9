"""Post-suite chip job (one process): high-res re-scoring + fast-pool A/B.

1. Re-scores every suite checkpoint (and the teacher) on 384 eval scenes —
   the 128-scene tables carry +-4.4 binomial points at p=0.5; 384 scenes
   halve that.
2. Fast-pool validation: trains the 2.5k-step baseline twice (windowed pool
   vs max_pool_2x2_fast via monkeypatch), comparing loss trajectories and
   steady-state images/sec. The fast pool is gradient-exact by unit test;
   this confirms nothing drifts at scale on the real chip and measures the
   speedup that would justify defaulting it on.

Run: nohup python scripts/run_post_suite.py > results/post_suite.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse
import copy
import json


STUDENT_RUNS = ["baseline_v4", "distilled_w1_v4", "ablate_wot0",
                "ablate_energy", "ablate_balanced", "baseline_s1",
                "distilled_w1_s1"]


def make_rescorer(eval_n: int):
    """Returns rescore(ckpt, backbone) -> metrics dict on `eval_n` class-0
    scenes. Shared by this script and run_pretrain_suite (one definition of
    the high-res eval protocol)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine import evaluator
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
    from kd6d_pose_adlp_tpu.engine.steps import build_forward
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose

    def rescore(ckpt, backbone):
        cfg = Config(model=ModelConfig(backbone=backbone,
                                       compute_dtype="bfloat16"))
        ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=256,
                                  max_objs=cfg.solver.max_objs,
                                  single_class=0, seed=0)
        consts = ds.consts()
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, mesh_diameters=tuple(np.asarray(consts.diameters))))
        meshes = [np.asarray(consts.kp3d[c]) for c in range(cfg.data.n_fg)]

        def eval_batches():
            from kd6d_pose_adlp_tpu.data.pipeline import collate
            tb = cfg.test.ims_per_batch
            for start in range(0, eval_n, tb):
                idx = [min(start + k, eval_n - 1) for k in range(tb)]
                samples = [ds.sample(i, train=False) for i in idx]
                yield collate(samples), [
                    dict(filename=f"synthetic_{i:06d}.png", K=s["meta"]["K"],
                         width=s["meta"]["width"], height=s["meta"]["height"],
                         class_ids=[s["meta"]["cls"]],
                         rotations=[s["meta"]["R"]],
                         translations=[s["meta"]["T"]])
                    for i, s in zip(idx, samples)]

        net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
        forward = build_forward(cfg, net)
        postprocess = build_postprocess(cfg, consts)
        init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
        variables, _ = load_params_loose(ckpt, init)
        res = evaluator.valid(cfg, consts, variables, forward, postprocess,
                              eval_batches(), meshes, step=0,
                              working_dir="outputs/post_suite_eval/")

        def avg(group, key):
            vals = [a.get(key) for a in res[group] if a and key in a]
            return round(float(np.mean(vals)), 2) if vals else 0.0

        return {k.strip(): avg(g, k) for g, k in [
            ("adi_per_class", "ADI.05d"), ("adi_per_class", "ADI.10d"),
            ("adi_per_class", "ADI.20d"), ("auc_per_class", "AUC    "),
            ("rep_per_class", "REP02px"),
            ("rep_per_class", "REP05px"), ("rep_per_class", "REP10px")]}

    return rescore


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval_n", type=int, default=384)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--skip_fast_pool", action="store_true")
    ap.add_argument("--skip_rescore", action="store_true")
    ap.add_argument("--out", type=str, default="results/post_suite.json")
    args = ap.parse_args()

    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()

    out = {}
    rescore = make_rescorer(args.eval_n)

    for name in ([] if args.skip_rescore else STUDENT_RUNS):
        ckpt = f"outputs/ab/{name}/final.ckpt"
        if os.path.exists(ckpt):
            out[name] = rescore(ckpt, "darknet_tiny_h")
            print(json.dumps({name: out[name]}), flush=True)
    tck = "outputs/ab/teacher30k/final.ckpt"
    if os.path.exists(tck) and not args.skip_rescore:
        out["teacher30k"] = rescore(tck, "darknet53")
        print(json.dumps({"teacher30k": out["teacher30k"]}), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    if not args.skip_fast_pool:
        import train_synthetic_tpu as tst
        from kd6d_pose_adlp_tpu.models import blocks, darknet

        base_ns = tst.build_parser().parse_args([])
        base_ns.steps = args.steps
        base_ns.eval_n = 128
        base_ns.working_dir = "outputs/ab/fastpool_off/"
        cache = {}
        base_ns._pool_cache = cache
        r_win = tst.run(base_ns)
        ns2 = copy.copy(base_ns)
        ns2.working_dir = "outputs/ab/fastpool_on/"
        ns2._pool_cache = cache
        darknet.max_pool_2x2 = blocks.max_pool_2x2_fast
        try:
            r_fast = tst.run(ns2)
        finally:
            darknet.max_pool_2x2 = blocks.max_pool_2x2
        out["fastpool"] = {"windowed": r_win, "fast": r_fast}
        print(json.dumps(out["fastpool"]), flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print("POST-SUITE-DONE", flush=True)


if __name__ == "__main__":
    main()
