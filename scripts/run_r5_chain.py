"""Round-5 TPU chain: multiclass end-to-end, eval-scan proof, seed
extensions — ONE chip claim, hard deadline.

Same discipline as scripts/run_r4*_chain.py (phases declare cost
estimates and are skipped when they don't fit; memguard after every
phase; TPU acquisition gate). This round's VM is FRESH: outputs/ was
wiped, so the pretext/teacher prerequisites are re-trained (phase 3)
before the seed-extension phases that need their checkpoints; suites
skip already-recorded runs via --trust_summary.

Phases (VERDICT r4 "next round" order):
  1. multiclass    — run_multiclass_suite: 15-class teacher + KD students
                     (teacher_class=pred) + per-class tables (VERDICT #1)
  2. eval_scan_ab  — bench_eval_overlap incl. scan arms on a real ckpt
                     (VERDICT #2 target: >=200 img/s end-to-end eval)
  3. prereqs       — re-train pretrain_tiny/pretrain_dn53/teacher30k_pt
                     (fresh VM wiped outputs/; ~60 min)
  4. s192_ext      — pretrain suite --seeds192 12: kd5/kd1 claims at
                     12 seed pairs (VERDICT #3 / weak #4)
  5. s2d_ext       — s2d suite --seeds 4 (VERDICT weak #3)
  6. bench         — fresh round-end headline capture via bench.py

Run: nohup python scripts/run_r5_chain.py --until_min 300 \
         >> results/r5_chain.log 2>&1 & echo $! > /tmp/r5_chain.pid
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
            print("CHAIN-R5: relay still down after 30 min; aborting (rc 2)",
                  flush=True)
            sys.exit(2)
        print("CHAIN-R5: relay down; waiting 60s", flush=True)
        time.sleep(60)
    try:
        import jax
        dev = jax.devices()[0]  # blocks while a previous claim releases
        print(f"CHAIN-R5: backend up: {dev.platform}", flush=True)
        if dev.platform == "cpu":
            print("CHAIN-R5: got CPU backend, not burning the budget (rc 3)",
                  flush=True)
            sys.exit(3)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001 — axon init failures aren't typed
        print(f"CHAIN-R5: backend init raised ({type(e).__name__}: {e}); "
              f"relaunch me in a few minutes (rc 4)", flush=True)
        sys.exit(4)
    if not bench_mod._probe_first_device_op(jax):
        print("CHAIN-R5: TPU claim never released (rc 3)", flush=True)
        sys.exit(3)

    def phase(name, est_min, fn):
        left = (deadline - time.time()) / 60.0
        if name in skip:
            print(f"===== CHAIN-R5: {name} SKIPPED (--skip) =====", flush=True)
            return None
        if est_min > left:
            print(f"===== CHAIN-R5: {name} NOT LAUNCHED — needs "
                  f"~{est_min:.0f} min, {left:.0f} min left =====", flush=True)
            return None
        print(f"\n===== CHAIN-R5: {name} @ {time.strftime('%H:%M:%S')} "
              f"({left:.0f} min budget left) =====", flush=True)
        t = time.time()
        try:
            fn()
            print(f"===== CHAIN-R5: {name} OK in {time.time()-t:.0f}s =====",
                  flush=True)
            return True
        except Exception:
            traceback.print_exc()
            print(f"===== CHAIN-R5: {name} FAILED after {time.time()-t:.0f}s "
                  f"=====", flush=True)
            return False
        finally:
            import memguard
            memguard.after_run(f"phase:{name}")

    def p_multiclass():
        import run_multiclass_suite
        sys.argv = ["run_multiclass_suite.py", "--until_ts", str(deadline)]
        run_multiclass_suite.main()

    def p_eval_scan():
        import bench_eval_overlap
        sys.argv = ["bench_eval_overlap.py", "--weight_file",
                    "outputs/multiclass/mc_base_s0/final.ckpt",
                    "--out", "results/eval_overlap_r5.json"]
        bench_eval_overlap.main()

    def p_prereqs():
        # NO --trust_summary here: these three runs are re-trained precisely
        # because their CHECKPOINTS are needed downstream even though their
        # metrics are already in the summary (the 05:14 run of this chain
        # passed it and the phase no-op'd — s192_ext then failed on the
        # missing pretext ckpt; run_r5b_chain.py is the recovery)
        import run_pretrain_suite
        sys.argv = ["run_pretrain_suite.py",
                    "--only", "pretrain_tiny,pretrain_dn53,teacher30k_pt",
                    "--skip_rescore", "--until_ts", str(deadline)]
        run_pretrain_suite.main()

    def p_s192_ext():
        import run_pretrain_suite
        sys.argv = ["run_pretrain_suite.py", "--trust_summary",
                    "--seeds192", "12", "--until_ts", str(deadline)]
        run_pretrain_suite.main()

    def p_s2d_ext():
        import run_s2d_suite
        sys.argv = ["run_s2d_suite.py", "--trust_summary", "--seeds", "4",
                    "--until_ts", str(deadline)]
        run_s2d_suite.main()

    def p_bench():
        import bench
        sys.argv = ["bench.py"]
        bench.main()

    ok = {}
    ok["multiclass"] = phase("multiclass", 55, p_multiclass)
    ok["eval_scan_ab"] = phase("eval_scan_ab", 12, p_eval_scan)
    ok["prereqs"] = phase("prereqs", 65, p_prereqs)
    ok["s192_ext"] = phase("s192_ext", 30, p_s192_ext)
    ok["s2d_ext"] = phase("s2d_ext", 30, p_s2d_ext)
    ok["bench"] = phase("bench", 15, p_bench)
    print(f"\nR5-CHAIN-DONE {ok} (wall {(time.time()-T0)/60:.0f} min)",
          flush=True)


if __name__ == "__main__":
    main()
