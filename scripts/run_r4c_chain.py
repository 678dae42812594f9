"""Round-4 session-3 chain #2: scarce-regime statistics + int8-teacher KD.

Same discipline as run_r4_chain.py / run_r4b_chain.py (ONE chip claim,
hard --until_min deadline, cost-gated phases, memguard, TPU acquisition
gate).

Phases:
  1. s192 seed extension — run_pretrain_suite.py --seeds192 8 resumes the
     completed 5-seed suite and adds seeds 5-7 x {base, kd1, kd5} + their
     384-scene rescores. The round-4 suite found KD positive in ALL 5
     s192 kd1 seed pairs (sign-test floor p=0.0625); 8 pairs push the
     attainable p to 0.0078 if the direction holds (and honestly report
     any flip).
  2. int8-teacher s192 arms — pt_s192_kd1 re-run with --quant_teacher for
     seeds 0-4 (same pools, same teacher, same seeds as the recorded
     BN-folded arms): does PTQ preserve the KD effect end-to-end
     where it actually matters? Writes results/quant_s192_ab.json,
     rescored at 384 scenes for pairing against rescore384_pt_s192_kd1_s*.

Run: nohup python scripts/run_r4c_chain.py --until_min 110 \
         >> results/r4c_chain.log 2>&1 & echo $! > /tmp/r4c_chain.pid
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
# the SAME teacher the recorded pt_s192_kd1_s* folded arms used (the v2
# suite's best_teacher() resolved to the pretrained-init teacher because
# the round-2 scratch checkpoint is no longer on disk — verified in
# results/r4_chain.log run specs); pairing requires protocol identity
TEACHER = "outputs/pretrain2/teacher30k_pt/final.ckpt"
PRETRAIN_TINY = "outputs/pretrain2/tiny_h/final.ckpt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--until_min", type=float, required=True)
    ap.add_argument("--skip", type=str, default="")
    ap.add_argument("--quant_seeds", type=int, default=5)
    args = ap.parse_args()
    deadline = T0 + args.until_min * 60.0
    skip = set(args.skip.split(",")) if args.skip else set()

    import bench as bench_mod
    relay_deadline = time.time() + 1800
    while not bench_mod._tunnel_up(timeout_s=5):
        if time.time() > relay_deadline:
            print("CHAIN-R4C: relay still down after 30 min; aborting (rc 2)",
                  flush=True)
            sys.exit(2)
        print("CHAIN-R4C: relay down; waiting 60s", flush=True)
        time.sleep(60)
    try:
        import jax
        dev = jax.devices()[0]  # blocks while a previous claim releases
        print(f"CHAIN-R4C: backend up: {dev.platform}", flush=True)
        if dev.platform == "cpu":
            print("CHAIN-R4C: got CPU backend, not burning the budget (rc 3)",
                  flush=True)
            sys.exit(3)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001 — axon init failures aren't typed
        print(f"CHAIN-R4C: backend init raised ({type(e).__name__}: {e}); "
              f"relaunch me in a few minutes (rc 4)", flush=True)
        sys.exit(4)
    if not bench_mod._probe_first_device_op(jax):
        print("CHAIN-R4C: TPU claim never released (rc 3)", flush=True)
        sys.exit(3)

    def phase(name, est_min, fn):
        left = (deadline - time.time()) / 60.0
        if name in skip:
            print(f"===== CHAIN-R4C: {name} SKIPPED (--skip) =====", flush=True)
            return None
        if est_min > left:
            print(f"===== CHAIN-R4C: {name} NOT LAUNCHED — needs "
                  f"~{est_min:.0f} min, {left:.0f} min left =====", flush=True)
            return None
        print(f"\n===== CHAIN-R4C: {name} @ {time.strftime('%H:%M:%S')} "
              f"({left:.0f} min budget left) =====", flush=True)
        t = time.time()
        try:
            fn()
            print(f"===== CHAIN-R4C: {name} OK in {time.time()-t:.0f}s =====",
                  flush=True)
            return True
        except Exception:
            traceback.print_exc()
            print(f"===== CHAIN-R4C: {name} FAILED after {time.time()-t:.0f}s "
                  f"=====", flush=True)
            return False
        finally:
            import memguard
            memguard.after_run(f"phase:{name}")

    def p_seeds():
        import run_pretrain_suite
        sys.argv = ["run_pretrain_suite.py", "--seeds192", "8"]
        run_pretrain_suite.main()

    def p_seeds512():
        # widen the null-at-512 claim from 3 to 5 seed pairs (s192 stays at
        # the wider --seeds192; already-done runs are skipped)
        import run_pretrain_suite
        sys.argv = ["run_pretrain_suite.py", "--seeds", "5",
                    "--seeds192", "8"]
        run_pretrain_suite.main()

    def p_seeds_rich():
        # widen the rich-regime (1024-image) pairs from 2 to 5
        import run_pretrain_suite
        sys.argv = ["run_pretrain_suite.py", "--seeds", "5",
                    "--seeds192", "8", "--seeds_rich", "5"]
        run_pretrain_suite.main()

    def p_quant_s192():
        import memguard
        import run_post_suite
        import train_synthetic_tpu as tst
        out_path = "results/quant_s192_ab.json"
        summary = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                summary = json.load(f)
        base_ns = tst.build_parser().parse_args([])
        base_ns.eval_n = 128
        pool_cache, teacher_cache = {}, {}
        rescore = run_post_suite.make_rescorer(384)
        for s in range(args.quant_seeds):
            name = f"pt_s192_kd1q_s{s}"
            wd = f"outputs/pretrain2/{name}/"
            if name not in summary or not os.path.exists(wd + "final.ckpt"):
                ns = copy.copy(base_ns)
                ns.backbone_init = PRETRAIN_TINY
                ns.batches = 12
                ns.steps = 10000
                ns.seed = s
                ns.kd_weight = 1.0
                ns.weight_file_t = TEACHER
                ns.quant_teacher = 1
                ns.working_dir = wd
                ns._pool_cache = pool_cache
                ns._teacher_cache = teacher_cache
                print(f"=== run {name} ===", flush=True)
                t0 = time.time()
                out = tst.run(ns)
                out["wall_s"] = round(time.time() - t0, 1)
                summary[name] = out
                print(json.dumps({name: out}), flush=True)
                with open(out_path, "w") as f:
                    json.dump(summary, f, indent=1)
                memguard.after_run(name)
            key = f"rescore384_{name}"
            if key not in summary:
                summary[key] = rescore(wd + "final.ckpt", "darknet_tiny_h")
                print(json.dumps({key: summary[key]}), flush=True)
                with open(out_path, "w") as f:
                    json.dump(summary, f, indent=1)
                memguard.after_run(key)

    ok = {}
    ok["seeds"] = phase("s192 seed extension (5->8)", 55, p_seeds)
    ok["quant_s192"] = phase("int8-teacher s192 arms", 35, p_quant_s192)
    ok["seeds512"] = phase("s512 seed extension (3->5)", 35, p_seeds512)
    ok["seeds_rich"] = phase("rich seed extension (2->5)", 35, p_seeds_rich)
    print(f"\nR4C-CHAIN-DONE {ok} (wall {(time.time()-T0)/60:.0f} min)",
          flush=True)


if __name__ == "__main__":
    main()
