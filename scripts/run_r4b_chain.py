"""Round-4 session-3 TPU chain: int8 PTQ measurements, ONE chip claim.

Same discipline as scripts/run_r4_chain.py (hard --until_min deadline,
phases declare cost estimates and are skipped when they don't fit, memguard
after every phase, TPU acquisition gate so a claim collision or relay
outage can't silently burn the budget on CPU).

Phases, cheap-first:
  1. quant eval A/B   — scripts/bench_quant.py: 384-scene ADI/AUC/REP for
     float vs BN-folded vs int8 student + replay-immune forward timing
     (the accuracy cost + serving-side speedup of utils/quant).
  2. quant KD A/B     — scripts/bench_quant_kd.py: the live darknet53
     teacher folded-bf16 vs int8 inside the real KD multi-step, plus
     teacher-knowledge fidelity (voted cells / kp2d deltas).
  3. bench headline   — fresh round-end capture via bench.py
     (record_chip_capture plausibility guard active).

Run: nohup python scripts/run_r4b_chain.py --until_min 90 \
         >> results/r4b_chain.log 2>&1 & echo $! > /tmp/r4b_chain.pid
"""
from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)

T0 = time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--until_min", type=float, required=True)
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    deadline = T0 + args.until_min * 60.0
    skip = set(args.skip.split(",")) if args.skip else set()

    import bench as bench_mod
    relay_deadline = time.time() + 1800
    while not bench_mod._tunnel_up(timeout_s=5):
        if time.time() > relay_deadline:
            print("CHAIN-R4B: relay still down after 30 min; aborting (rc 2)",
                  flush=True)
            sys.exit(2)
        print("CHAIN-R4B: relay down; waiting 60s", flush=True)
        time.sleep(60)
    try:
        import jax
        dev = jax.devices()[0]  # blocks while a previous claim releases
        print(f"CHAIN-R4B: backend up: {dev.platform}", flush=True)
        if dev.platform == "cpu":
            print("CHAIN-R4B: got CPU backend, not burning the budget (rc 3)",
                  flush=True)
            sys.exit(3)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001 — axon init failures aren't typed
        print(f"CHAIN-R4B: backend init raised ({type(e).__name__}: {e}); "
              f"relaunch me in a few minutes (rc 4)", flush=True)
        sys.exit(4)
    if not bench_mod._probe_first_device_op(jax):
        print("CHAIN-R4B: TPU claim never released (rc 3)", flush=True)
        sys.exit(3)

    def phase(name, est_min, fn):
        left = (deadline - time.time()) / 60.0
        if name in skip:
            print(f"===== CHAIN-R4B: {name} SKIPPED (--skip) =====", flush=True)
            return None
        if est_min > left:
            print(f"===== CHAIN-R4B: {name} NOT LAUNCHED — needs "
                  f"~{est_min:.0f} min, {left:.0f} min left =====", flush=True)
            return None
        print(f"\n===== CHAIN-R4B: {name} @ {time.strftime('%H:%M:%S')} "
              f"({left:.0f} min budget left) =====", flush=True)
        t = time.time()
        try:
            fn()
            print(f"===== CHAIN-R4B: {name} OK in {time.time()-t:.0f}s =====",
                  flush=True)
            return True
        except Exception:
            traceback.print_exc()
            print(f"===== CHAIN-R4B: {name} FAILED after {time.time()-t:.0f}s "
                  f"=====", flush=True)
            return False
        finally:
            import memguard
            memguard.after_run(f"phase:{name}")

    def p_quant_eval():
        import bench_quant
        sys.argv = ["bench_quant.py"]
        bench_quant.main()

    def p_quant_kd():
        import bench_quant_kd
        sys.argv = ["bench_quant_kd.py"]
        bench_quant_kd.main()

    def p_bench():
        import bench
        sys.argv = ["bench.py"]
        bench.main()

    ok = {}
    ok["quant_eval"] = phase("quant eval A/B", 25, p_quant_eval)
    ok["quant_kd"] = phase("quant KD A/B", 25, p_quant_kd)
    ok["bench"] = phase("bench headline", 25, p_bench)
    print(f"\nR4B-CHAIN-DONE {ok} (wall {(time.time()-T0)/60:.0f} min)",
          flush=True)


if __name__ == "__main__":
    main()
