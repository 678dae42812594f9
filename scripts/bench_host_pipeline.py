"""Host data-pipeline throughput on a real on-disk BOP tree (no TPU).

Measures PrefetchLoader images/sec — PNG decode + affine warps + fused
normalize + collate — with the C++ dataplane (native/dataplane.cpp) vs the
cv2 fallback, across thread counts, on this box's single CPU core. This is
the number that decides whether a real-data 10k-step TPU run would be
host-bound (VERDICT r2 weak #3); the reference's equivalent path is the
torch DataLoader over libs/dataset.py:27-183.

Run after scripts/make_bop_dataset.py:
    python scripts/bench_host_pipeline.py --root outputs/bop_synth
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def measure(cfg, n_batches: int, num_threads: int, fast: bool = False) -> float:
    import dataclasses
    from kd6d_pose_adlp_tpu.data.pipeline import BOPPoseDataset, PrefetchLoader
    if fast:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, fast_pipeline=True))
    ds = BOPPoseDataset(cfg, cfg.data.train_list, train=True)
    loader = PrefetchLoader(ds, cfg.solver.ims_per_batch, train=True,
                            num_threads=num_threads, seed=0)
    it = iter(loader)
    for _ in range(2):  # warm caches (scene JSONs, first decodes)
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        batch, _ = next(it)
        n += int(batch.images.shape[0])
    dt = time.perf_counter() - t0
    # drain: drop the iterator so producers stop
    del it
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="outputs/bop_synth")
    ap.add_argument("--n_batches", type=int, default=20)
    ap.add_argument("--threads", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--out", type=str, default="results/host_pipeline.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # collate makes jnp arrays

    from kd6d_pose_adlp_tpu.config import load_yaml_config
    from kd6d_pose_adlp_tpu.data import native

    cfg = load_yaml_config(os.path.join(args.root, "config.yaml"))
    results = {"batch_size": cfg.solver.ims_per_batch,
               "native_lib_available": native.get_lib() is not None}
    from kd6d_pose_adlp_tpu.data import bop

    def clear_decode_cache():
        bop._DECODE_CACHE._d.clear()
        bop._DECODE_CACHE.nbytes = 0

    # decode-cache cold vs warm measured separately: the LRU
    # (bop._DECODE_CACHE) makes steady-state throughput decode-free, so
    # order would otherwise contaminate the configs
    for label, env, fast in (("native", None, False), ("cv2", "1", False),
                             ("fast_native", None, True), ("fast_cv2", "1", True)):
        if env is None and not results["native_lib_available"]:
            continue
        if env is None:
            os.environ.pop("KD6D_NO_NATIVE", None)
        else:
            os.environ["KD6D_NO_NATIVE"] = env
        for nt in args.threads:
            clear_decode_cache()
            cold = measure(cfg, args.n_batches, nt, fast=fast)
            warm = measure(cfg, args.n_batches, nt, fast=fast)
            results[f"{label}_t{nt}_cold_img_s"] = round(cold, 1)
            results[f"{label}_t{nt}_warm_img_s"] = round(warm, 1)
            print(json.dumps({f"{label}_t{nt}": {"cold": round(cold, 1),
                                                 "warm": round(warm, 1)}}),
                  flush=True)
    os.environ.pop("KD6D_NO_NATIVE", None)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
