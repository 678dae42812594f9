"""TPU A/B: frozen-teacher knowledge caching (engine/steps.precompute_pool_votes).

Two identical KD runs (same seed/pool/teacher) except --cache_teacher; the
cached arm must train equivalently (endpoint within seed-noise; the CPU
equivalence test pins per-step math) while the step drops the darknet53
teacher forward (~70% of KD-step FLOPs, BASELINE.md component table).

Run (TPU): python scripts/bench_cache_teacher.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--teacher", type=str,
                    default="outputs/ab/teacher30k/final.ckpt")
    ap.add_argument("--out", type=str, default="results/cache_teacher_ab.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import train_synthetic_tpu as tst
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()

    pool_cache, teacher_cache = {}, {}
    out = {}
    for arm, cache in (("live", 0), ("cached", 1)):
        ns = tst.build_parser().parse_args([])
        ns.cpu = args.cpu
        ns.steps = args.steps
        ns.batches = args.batches
        ns.kd_weight = 5.0
        ns.weight_file_t = args.teacher
        ns.cache_teacher = cache
        ns.seed = 0
        ns.val_freq = 500  # throughput meter resets per window -> the last
        #                    logged images_per_sec is steady-state, ex-compile
        ns.working_dir = f"outputs/cache_ab/{arm}/"
        ns._pool_cache = pool_cache
        ns._teacher_cache = teacher_cache
        t0 = time.time()
        res = tst.run(ns)
        res["wall_s"] = round(time.time() - t0, 1)
        try:
            with open(ns.working_dir + "scalars.jsonl") as f:
                for line in f:
                    rec = json.loads(line)
                    ips = rec.get("training/images_per_sec")
                    if ips:
                        res["steady_images_per_sec"] = round(ips, 1)
        except OSError:
            pass
        out[arm] = res
        print(json.dumps({arm: res}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    lw, cw = out["live"]["wall_s"], out["cached"]["wall_s"]
    print(f"cache_teacher A/B: live {lw}s vs cached {cw}s "
          f"({lw / max(cw, 1e-9):.2f}x), "
          f"ADI.10d {out['live']['final'].get('ADI.10d')} vs "
          f"{out['cached']['final'].get('ADI.10d')}", flush=True)


if __name__ == "__main__":
    main()
