"""Round-5 follow-on chain: pretext-init multiclass (v2) + kernel A/Bs.

Runs AFTER run_r5_chain.py (its prereqs phase re-creates the pretext
checkpoints this chain's v2 multiclass protocol warm-starts from). Same
discipline: one claim, hard deadline, memguard, phases skipped when they
don't fit.

This is also the RECOVERY for the r5 chain's prereqs no-op (it passed
--trust_summary to the phase whose whole point was re-training runs that
ARE in the summary; s192_ext then died on the missing pretext ckpt and
s2d_ext ran baseline arms only).

Phases, priority order:
  1. prereqs    — re-train pretrain_tiny / pretrain_dn53 / teacher30k_pt
                  (~62 min; unlocks everything below)
  2. s192_ext   — pretrain suite --seeds192 12: the paper-regime KD claim
                  at 12 seed pairs (VERDICT r4 next #3)
  3. mc2        — run_multiclass_suite --prefix v2_ with pretext-init
                  teacher AND students (the round-5 v1 run proved 15-class
                  from-scratch at 30k steps sits at near-zero eval; the
                  pretext backbones are the in-image ImageNet surrogate,
                  exactly like the s192 KD suite protocol)
  4. s2d_kd     — s2d suite --seeds 4: the kd1 arms chain 1 had to skip
                  (teacher was missing)
  5. bn_stats   — scripts/bench_bn_stats.py: f32-vs-bf16 BN statistics
                  accumulation on the full KD step (VERDICT r4 next #5a)
  6. conv_seg   — scripts/bench_conv_pallas.py incl. the chained
                  stem->pool->s2 flat-layout serving segment (next #5b)
  7. bench      — fresh headline capture (records the new
                  sustained_incl_compile_img_s field on chip)

Run: nohup python scripts/run_r5b_chain.py --until_min 180 \
         >> results/r5b_chain.log 2>&1 & echo $! > /tmp/r5b_chain.pid
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
PRETEXT_DN53 = "outputs/pretrain2/darknet53/final.ckpt"
PRETEXT_TINY = "outputs/pretrain2/tiny_h/final.ckpt"


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
            print("CHAIN-R5B: relay still down after 30 min (rc 2)", flush=True)
            sys.exit(2)
        print("CHAIN-R5B: relay down; waiting 60s", flush=True)
        time.sleep(60)
    try:
        import jax
        dev = jax.devices()[0]  # blocks while a previous claim releases
        print(f"CHAIN-R5B: backend up: {dev.platform}", flush=True)
        if dev.platform == "cpu":
            sys.exit(3)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        print(f"CHAIN-R5B: backend init raised ({type(e).__name__}: {e}); "
              f"relaunch me (rc 4)", flush=True)
        sys.exit(4)
    if not bench_mod._probe_first_device_op(jax):
        print("CHAIN-R5B: TPU claim never released (rc 3)", flush=True)
        sys.exit(3)

    def phase(name, est_min, fn):
        left = (deadline - time.time()) / 60.0
        if name in skip:
            print(f"===== CHAIN-R5B: {name} SKIPPED =====", flush=True)
            return None
        if est_min > left:
            print(f"===== CHAIN-R5B: {name} NOT LAUNCHED — needs "
                  f"~{est_min:.0f} min, {left:.0f} min left =====", flush=True)
            return None
        print(f"\n===== CHAIN-R5B: {name} @ {time.strftime('%H:%M:%S')} "
              f"({left:.0f} min budget left) =====", flush=True)
        t = time.time()
        try:
            fn()
            print(f"===== CHAIN-R5B: {name} OK in {time.time()-t:.0f}s =====",
                  flush=True)
            return True
        except Exception:
            traceback.print_exc()
            print(f"===== CHAIN-R5B: {name} FAILED after {time.time()-t:.0f}s"
                  f" =====", flush=True)
            return False
        finally:
            import memguard
            memguard.after_run(f"phase:{name}")

    def p_prereqs():
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

    def p_s2d_kd():
        import run_s2d_suite
        sys.argv = ["run_s2d_suite.py", "--trust_summary", "--seeds", "4",
                    "--until_ts", str(deadline)]
        run_s2d_suite.main()

    def p_mc2():
        if not (os.path.exists(PRETEXT_DN53) and os.path.exists(PRETEXT_TINY)):
            raise RuntimeError(f"pretext checkpoints missing ({PRETEXT_DN53}, "
                               f"{PRETEXT_TINY}) — run the r5 chain prereqs "
                               f"phase first")
        import run_multiclass_suite
        sys.argv = ["run_multiclass_suite.py", "--prefix", "v2_",
                    "--teacher_init", PRETEXT_DN53,
                    "--student_init", PRETEXT_TINY,
                    "--until_ts", str(deadline)]
        run_multiclass_suite.main()

    def p_bn_stats():
        import bench_bn_stats
        sys.argv = ["bench_bn_stats.py"]
        bench_bn_stats.main()

    def p_conv_seg():
        import bench_conv_pallas
        sys.argv = ["bench_conv_pallas.py",
                    "--out", "results/conv_pallas_ab_r5.json"]
        bench_conv_pallas.main()

    def p_bench():
        import bench
        sys.argv = ["bench.py"]
        bench.main()

    ok = {}
    ok["prereqs"] = phase("prereqs", 62, p_prereqs)
    ok["s192_ext"] = phase("s192_ext", 25, p_s192_ext)
    ok["mc2"] = phase("mc2", 40, p_mc2)
    ok["s2d_kd"] = phase("s2d_kd", 20, p_s2d_kd)
    ok["bn_stats"] = phase("bn_stats", 14, p_bn_stats)
    ok["conv_seg"] = phase("conv_seg", 18, p_conv_seg)
    ok["bench"] = phase("bench", 12, p_bench)
    print(f"\nR5B-CHAIN-DONE {ok} (wall {(time.time()-T0)/60:.0f} min)",
          flush=True)


if __name__ == "__main__":
    main()
