"""Round-4 session-3 chain #3: the max-sustained-training configuration.

BASELINE.md documents each throughput lever separately: pool-scan loop,
`--cache_teacher` (1.53x on tiny_h/bs16), `darknet_tiny_h_s2d` (1.17x
forward), batch 64 (+38% step MFU). This chain measures them COMPOSED —
the fastest full KD training configuration the framework currently
offers — plus the same-protocol tiny_h control:

  arm A (control) : tiny_h,  bs16, live folded teacher  (the headline cfg)
  arm B           : tiny_h,  bs64, cache_teacher
  arm C (max)     : s2d,     bs64, cache_teacher

All arms: 2,500 steps, kd_weight 5, same 1024-image pool volume,
eval at the end (sanity, 128 scenes). Sustained img/s = steps*batch /
train-wall (compile excluded via the loop's own timing), also recorded
as wall_s including eval. Writes results/max_throughput.json.

Run: nohup python scripts/run_r4e_chain.py --until_min 60 \
         >> results/r4e_chain.log 2>&1 & echo $! > /tmp/r4e_chain.pid
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)

T0 = time.time()
TEACHER = "outputs/pretrain2/teacher30k_pt/final.ckpt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--until_min", type=float, required=True)
    ap.add_argument("--steps", type=int, default=2500)
    args = ap.parse_args()
    deadline = T0 + args.until_min * 60.0

    import bench as bench_mod
    relay_deadline = time.time() + 1800
    while not bench_mod._tunnel_up(timeout_s=5):
        if time.time() > relay_deadline:
            print("CHAIN-R4E: relay still down after 30 min; aborting (rc 2)",
                  flush=True)
            sys.exit(2)
        print("CHAIN-R4E: relay down; waiting 60s", flush=True)
        time.sleep(60)
    try:
        import jax
        dev = jax.devices()[0]
        print(f"CHAIN-R4E: backend up: {dev.platform}", flush=True)
        if dev.platform == "cpu":
            sys.exit(3)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        print(f"CHAIN-R4E: backend init raised ({type(e).__name__}: {e}); "
              f"relaunch me (rc 4)", flush=True)
        sys.exit(4)
    if not bench_mod._probe_first_device_op(jax):
        print("CHAIN-R4E: TPU claim never released (rc 3)", flush=True)
        sys.exit(3)

    import memguard
    import train_synthetic_tpu as tst

    out_path = "results/max_throughput.json"
    summary = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            summary = json.load(f)

    base_ns = tst.build_parser().parse_args([])
    base_ns.eval_n = 128
    base_ns.steps = args.steps
    base_ns.kd_weight = 5.0
    base_ns.weight_file_t = TEACHER
    pool_cache, teacher_cache = {}, {}

    arms = [
        ("A_tinyh_bs16_live", dict(backbone="darknet_tiny_h", batch_size=16,
                                   batches=64, cache_teacher=0)),
        ("B_tinyh_bs64_cached", dict(backbone="darknet_tiny_h", batch_size=64,
                                     batches=16, cache_teacher=1)),
        ("C_s2d_bs64_cached", dict(backbone="darknet_tiny_h_s2d",
                                   batch_size=64, batches=16,
                                   cache_teacher=1)),
        # D: push batch to 128 (same 1024-image pool volume). Cached teacher
        # leaves only the student fwd/bwd on the step; bs128 fills the MXU
        # further (BASELINE.md: "batch size is the remaining lever").
        ("D_s2d_bs128_cached", dict(backbone="darknet_tiny_h_s2d",
                                    batch_size=128, batches=8,
                                    cache_teacher=1)),
    ]
    for name, spec in arms:
        if name in summary:
            print(f"=== {name}: already done, skipping ===", flush=True)
            continue
        if (deadline - time.time()) / 60.0 < 12:
            print(f"=== {name}: NOT LAUNCHED (budget) ===", flush=True)
            continue
        ns = copy.copy(base_ns)
        for k, v in spec.items():
            setattr(ns, k, v)
        ns.working_dir = f"outputs/max_tp/{name}/"
        ns._pool_cache = pool_cache
        ns._teacher_cache = teacher_cache
        print(f"=== run {name}: {spec} ===", flush=True)
        t0 = time.time()
        try:
            out = tst.run(ns)
        except Exception:
            traceback.print_exc()
            continue
        out["wall_s"] = round(time.time() - t0, 1)
        out["images"] = args.steps * spec["batch_size"]
        summary[name] = out
        print(json.dumps({name: out}), flush=True)
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
        memguard.after_run(name)
    print(f"\nR4E-CHAIN-DONE (wall {(time.time()-T0)/60:.0f} min)", flush=True)


if __name__ == "__main__":
    main()
