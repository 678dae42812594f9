"""One-process A/B suite: baseline + distilled + KD ablations + seed repeat.

Runs every experiment sequentially inside a single TPU process so the
15-30 min axon claim latency is paid once, the device-resident batch pool
and teacher params are shared, and identically-shaped train steps reuse
the in-process XLA program cache. Writes per-run logs under outputs/ab/ and
one suite summary JSON at the end.

Run: nohup python scripts/run_ab_suite.py > results/ab_suite.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json
import time


def specs(teacher, scarce=False, scarce_batches=12, kd_weight=1.0):
    base = dict(working_dir="", kd_weight=0.0, seed=0, gtype="sinkhorn",
                reach=0.5, weighted_ot=1)
    kd = dict(kd_weight=kd_weight, backbone_t="darknet53",
              weight_file_t=teacher)
    if scarce:
        # LINEMOD-scale data scarcity (12x16=192 train images vs the
        # reference ape split's ~183): the regime where the paper's KD
        # effect actually lives — the teacher keeps its 2048-image pool.
        # val_freq 2000: overfitting curves — the baseline should degrade
        # late on 192 images while the teacher-regularized student holds
        b = scarce_batches
        sc = dict(batches=b, val_freq=2000)
        tag = "scarce" if b == 12 else f"scarce{b}"
        if kd_weight != 1.0:
            tag = f"{tag}w{kd_weight:g}"
        return [
            (f"{tag}_baseline_s0", dict(base, **sc)),
            (f"{tag}_distilled_s0", dict(base, **sc, **kd)),
            (f"{tag}_baseline_s1", dict(base, **sc, seed=1)),
            (f"{tag}_distilled_s1", dict(base, **sc, **kd, seed=1)),
            (f"{tag}_baseline_s2", dict(base, **sc, seed=2)),
            (f"{tag}_distilled_s2", dict(base, **sc, **kd, seed=2)),
        ]
    return [
        ("baseline_v4", dict(base)),
        ("distilled_w1_v4", dict(base, **kd)),
        ("ablate_wot0", dict(base, **kd, weighted_ot=0)),
        ("ablate_energy", dict(base, **kd, gtype="energy")),
        ("ablate_balanced", dict(base, **kd, reach=0.0)),
        ("baseline_s1", dict(base, seed=1)),
        ("distilled_w1_s1", dict(base, **kd, seed=1)),
        ("ablate_wot0_s1", dict(base, **kd, weighted_ot=0, seed=1)),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", type=str,
                    default="outputs/ab/teacher30k/final.ckpt")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated run names to include")
    ap.add_argument("--scarce", action="store_true",
                    help="LINEMOD-scale scarce-data pairs instead")
    ap.add_argument("--scarce_batches", type=int, default=12)
    ap.add_argument("--kd_weight", type=float, default=1.0,
                    help="weight for the distilled arms")
    ap.add_argument("--out", type=str, default="results/ab_suite.json")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import train_synthetic_tpu as tst

    base_ns = tst.build_parser().parse_args([])
    base_ns.steps = args.steps
    base_ns.eval_n = 128  # suite standard (CLI default is 64)
    pool_cache, teacher_cache = {}, {}

    keep = set(args.only.split(",")) if args.only else None
    summary = {}
    for name, spec in specs(args.teacher, scarce=args.scarce,
                           scarce_batches=args.scarce_batches,
                           kd_weight=args.kd_weight):
        if keep is not None and name not in keep:
            continue
        ns = copy.copy(base_ns)
        for k, v in spec.items():
            setattr(ns, k, v)
        ns.working_dir = f"outputs/ab/{name}/"
        ns._pool_cache = pool_cache
        ns._teacher_cache = teacher_cache
        print(f"=== run {name}: {spec} ===", flush=True)
        t0 = time.time()
        out = tst.run(ns)
        out["wall_s"] = round(time.time() - t0, 1)
        summary[name] = out
        print(json.dumps({name: out}), flush=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    print("AB-SUITE-DONE", flush=True)



if __name__ == "__main__":
    main()
