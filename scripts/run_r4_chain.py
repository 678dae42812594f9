"""Round-4 TPU chain, ONE process / one chip claim, with a HARD deadline.

Round-end discipline (VERDICT r3 next #1b): two of three rounds ended with
the driver's bench red because a builder chip process was still holding the
single-process TPU claim at snapshot time. This chain takes --until_min
(minutes of wall budget from launch); every phase declares a cost estimate
and is NOT LAUNCHED unless it fits inside the budget with margin, so the
process always exits well before round end and the claim has the 15-30 min
release window (CLAUDE.md) before anyone else needs the chip.

Phases, cheap-first:
  1. bench headline — fresh capture with the t_vars device_put fix (the
     3.68 img/s anomaly root cause); record_chip_capture guards the record.
  2. conv Pallas A/B — the restructured 9-tap accumulated-dot kernel
     (ops/conv_pallas.py) that replaces the Mosaic-refused concat form.
  3. eval overlap A/B — serial vs double-buffered evaluator.valid.
  4. suite rescores — resume the ~15 384-scene rescores chain5's OOM cut
     off (run_pretrain_suite skips everything already in the summary).
  5. s2d promotion suite — 10k-step x 2 seeds x {tiny_h, s2d} x
     {base, kd1} + 384-scene rescores (the big one; gets the remaining
     budget as its own internal deadline).
  6. cache-teacher A/B, 7. component probe, 8. serving bench — the chain5
     phases that never ran.

memguard logs host RSS after every phase and clears jax caches past
40 GB (chain5 died at 130 GB RSS; the box has 128 GB, no swap).

Run: nohup python scripts/run_r4_chain.py --until_min 420 \
         >> results/r4_chain.log 2>&1 &
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
    ap.add_argument("--until_min", type=float, required=True,
                    help="hard wall budget in minutes from launch; phases "
                         "that don't fit are skipped and the chain exits")
    ap.add_argument("--skip", type=str, default="",
                    help="comma-separated phase names to skip")
    args = ap.parse_args()
    deadline = T0 + args.until_min * 60.0
    skip = set(args.skip.split(",")) if args.skip else set()

    # -- TPU acquisition gate: a 5-hour chain must never silently run on
    # the CPU fallback. Wait for the relay, let jax init block while the
    # previous process's claim releases (the observed-normal path), then
    # probe the first device op with backoff (the BENCH_r03 failure mode).
    # Exit codes: 2 = relay down, 3 = claim never released, 4 = backend
    # init raised (a fresh process may succeed — relaunch).
    import bench as bench_mod
    relay_deadline = time.time() + 1800
    while not bench_mod._tunnel_up(timeout_s=5):
        if time.time() > relay_deadline:
            print("CHAIN-R4: relay still down after 30 min; aborting (rc 2)",
                  flush=True)
            sys.exit(2)
        print("CHAIN-R4: relay down; waiting 60s", flush=True)
        time.sleep(60)
    try:
        import jax
        dev = jax.devices()[0]  # blocks while the claim releases
        print(f"CHAIN-R4: backend up: {dev.platform}", flush=True)
        if dev.platform == "cpu":
            print("CHAIN-R4: got CPU backend, not burning the budget (rc 3)",
                  flush=True)
            sys.exit(3)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001 — axon init failures aren't typed
        print(f"CHAIN-R4: backend init raised ({type(e).__name__}: {e}); "
              f"relaunch me in a few minutes (rc 4)", flush=True)
        sys.exit(4)
    if not bench_mod._probe_first_device_op(jax):
        print("CHAIN-R4: TPU claim never released (rc 3)", flush=True)
        sys.exit(3)

    def phase(name, est_min, fn):
        left = (deadline - time.time()) / 60.0
        if name in skip:
            print(f"===== CHAIN-R4: {name} SKIPPED (--skip) =====", flush=True)
            return None
        if est_min > left:
            print(f"===== CHAIN-R4: {name} NOT LAUNCHED — needs ~{est_min:.0f} "
                  f"min, {left:.0f} min left in budget =====", flush=True)
            return None
        print(f"\n===== CHAIN-R4: {name} @ {time.strftime('%H:%M:%S')} "
              f"({left:.0f} min budget left) =====", flush=True)
        t = time.time()
        try:
            fn()
            print(f"===== CHAIN-R4: {name} OK in {time.time()-t:.0f}s =====",
                  flush=True)
            return True
        except Exception:
            traceback.print_exc()
            print(f"===== CHAIN-R4: {name} FAILED after {time.time()-t:.0f}s "
                  f"=====", flush=True)
            return False
        finally:
            import memguard
            memguard.after_run(f"phase:{name}")

    def p_bench():
        import bench
        sys.argv = ["bench.py"]
        bench.main()

    def p_conv_ab():
        import bench_conv_pallas
        sys.argv = ["bench_conv_pallas.py"]
        bench_conv_pallas.main()

    def p_eval_overlap():
        import bench_eval_overlap
        sys.argv = ["bench_eval_overlap.py"]
        bench_eval_overlap.main()

    def p_rescores():
        import run_pretrain_suite
        # resumes: all 31 runs + 14 rescores are already in the summary
        sys.argv = ["run_pretrain_suite.py", "--seeds192", "5"]
        run_pretrain_suite.main()

    def p_s2d():
        import run_s2d_suite
        # leave 20 min of slack for the suite's own teardown + rescores
        sys.argv = ["run_s2d_suite.py",
                    "--until_ts", str(deadline - 20 * 60)]
        run_s2d_suite.main()

    def p_cache_ab():
        import bench_cache_teacher
        sys.argv = ["bench_cache_teacher.py", "--teacher",
                    "outputs/pretrain2/teacher30k_pt/final.ckpt"]
        bench_cache_teacher.main()

    def p_components():
        import bench_components
        sys.argv = ["bench_components.py", "--trace"]
        bench_components.main()

    def p_serving():
        import bench_serving
        sys.argv = ["bench_serving.py"]
        bench_serving.main()

    ok = {}
    ok["bench"] = phase("bench headline", 25, p_bench)
    ok["conv_ab"] = phase("conv pallas A/B", 15, p_conv_ab)
    ok["eval_overlap"] = phase("eval overlap A/B", 15, p_eval_overlap)
    ok["rescores"] = phase("pretrain suite rescores (resume)", 45, p_rescores)
    ok["s2d"] = phase("s2d promotion suite", 90, p_s2d)
    ok["cache_ab"] = phase("teacher-knowledge cache A/B", 25, p_cache_ab)
    ok["components"] = phase("component probe (+trace)", 15, p_components)
    ok["serving"] = phase("serving-artifact bench", 15, p_serving)
    print(f"\nR4-CHAIN-DONE {ok} (wall {(time.time()-T0)/60:.0f} min)",
          flush=True)


if __name__ == "__main__":
    main()
