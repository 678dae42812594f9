"""Round-3 session-5 TPU chain, ONE process / one chip claim.

The machine was rebuilt before this session: /root/repo/outputs (every
checkpoint: pretext backbones, teachers, A/B students, the BOP tree) and
the persistent XLA cache are GONE; only git-tracked files survived. The
relay is UP. This chain re-runs the round-3 chip work in a cheap-first
order so an outage mid-chain still leaves the quick wins captured:

  1. bench.py headline (validates the driver artifact path, warms the
     KD-step compile cache).
  2. Perf suite (teacher BN folding, narrow-stage student variants,
     bs 16/64/128 curve, 2.5k-step accuracy A/Bs) — VERDICT r2 #2/#3.
  3. Pallas fused-conv A/B — VERDICT r2 #3.
  4. BOP-on-disk rehearsal (train 2k + eval + fast-pipeline A/B) —
     VERDICT r2 #4. Tree regenerated on CPU before launch.
  5. Pretrain-init KD suite, FULL re-run (pretexts + teacher + s192 x5
     seeds + s512 x3 + rich + rescores; ~4-5 h) — VERDICT r2 #1.
  6. Cache-teacher throughput A/B against the suite's teacher.
  7. Component probe with profiler trace; serving-artifact bench.

Phases are isolated: a failure logs and the next phase still runs.
Run: nohup python scripts/run_r3_chain5.py >> results/r3_chain5.log 2>&1 &
(append — watch_tunnel.sh relaunches with >>; truncating would erase the
DONE marker the supervisor greps for)
"""
from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)


def phase(name, fn):
    print(f"\n===== CHAIN5: {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"===== CHAIN5: {name} OK in {time.time()-t0:.0f}s =====",
              flush=True)
        return True
    except Exception:
        traceback.print_exc()
        print(f"===== CHAIN5: {name} FAILED after {time.time()-t0:.0f}s =====",
              flush=True)
        return False


def main():
    import bench_cache_teacher
    import bench_components
    import bench_conv_pallas
    import run_perf_suite
    import run_pretrain_suite

    def p_bench():
        import bench
        sys.argv = ["bench.py"]
        bench.main()

    def p_perf():
        sys.argv = ["run_perf_suite.py", "--train_ab",
                    "--batches", "16", "64", "128"]
        run_perf_suite.main()

    def p_conv_ab():
        sys.argv = ["bench_conv_pallas.py"]
        bench_conv_pallas.main()

    def p_bop_train():
        import train_kd
        sys.argv = ["train_kd.py",
                    "--config_file", "outputs/bop_synth/config.yaml",
                    "--data", "bop", "--max_iters", "2000",
                    "--kd_weight", "0", "--num_workers", "1",
                    "--vis_every", "0",
                    "--working_dir", "outputs/bop_rehearsal/"]
        train_kd.main()

    def p_bop_eval():
        import test as test_cli
        sys.argv = ["test.py",
                    "--config_file", "outputs/bop_synth/config.yaml",
                    "--data", "bop",
                    "--weight_file", "outputs/bop_rehearsal/final.ckpt",
                    "--working_dir", "outputs/bop_rehearsal_eval/"]
        test_cli.main()

    def p_bop_fast():
        import train_kd
        for arm, flags in (("slow", []), ("fast", ["--fast_pipeline"])):
            sys.argv = ["train_kd.py",
                        "--config_file", "outputs/bop_synth/config.yaml",
                        "--data", "bop", "--max_iters", "500",
                        "--kd_weight", "0", "--num_workers", "2",
                        "--vis_every", "0",
                        "--working_dir", f"outputs/bop_fast_ab/{arm}/"] + flags
            train_kd.main()

    def p_suite():
        sys.argv = ["run_pretrain_suite.py", "--seeds192", "5"]
        run_pretrain_suite.main()

    def p_cache_ab():
        # the scratch teacher died with outputs/; the suite's pretrained-init
        # teacher (phase 5) is the only 30k darknet53 on disk now
        sys.argv = ["bench_cache_teacher.py", "--teacher",
                    "outputs/pretrain2/teacher30k_pt/final.ckpt"]
        bench_cache_teacher.main()

    def p_components():
        sys.argv = ["bench_components.py", "--trace"]
        bench_components.main()

    def p_serving():
        import bench_serving
        sys.argv = ["bench_serving.py"]
        bench_serving.main()

    ok = {}
    ok["bench"] = phase("bench headline", p_bench)
    ok["perf"] = phase("perf suite", p_perf)
    ok["conv_ab"] = phase("conv pallas A/B", p_conv_ab)
    ok["bop_train"] = phase("bop rehearsal train", p_bop_train)
    ok["bop_eval"] = phase("bop rehearsal eval", p_bop_eval)
    ok["bop_fast"] = phase("bop fast-pipeline A/B", p_bop_fast)
    ok["suite"] = phase("pretrain suite (full re-run)", p_suite)
    ok["cache_ab"] = phase("teacher-knowledge cache A/B", p_cache_ab)
    ok["components"] = phase("component probe (+trace)", p_components)
    ok["serving"] = phase("serving-artifact bench", p_serving)
    print(f"\nR3-CHAIN5-DONE {ok}", flush=True)


if __name__ == "__main__":
    main()
