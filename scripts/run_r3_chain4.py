"""Round-3 TPU resume chain, ONE process / one chip claim.

Launched (by scripts/watch_tunnel.sh) after the 19:27 tunnel outage killed
chain2 mid-suite. Re-runs ALL remaining round-3 chip work in priority
order — run_pretrain_suite skips completed runs, so only the lost arms
re-execute:

  1. Pretrained-init KD suite resume (s192 seed 2, s512, rich, rescores).
  2. Perf suite (BN folding + narrow-stage variants + 2.5k-step A/B).
  3. BOP-on-disk rehearsal (train_kd.py --data bop + test.py).
  4. Pallas fused-conv A/B (scripts/bench_conv_pallas.py).
  5. Component probe with profiler trace.
  6. bench.py headline capture.

Phases are isolated: a failure logs and the next phase still runs.

Run: nohup python scripts/run_r3_chain4.py > results/r3_chain4.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)


def phase(name, fn):
    print(f"\n===== CHAIN4: {name} =====", flush=True)
    try:
        fn()
        return True
    except Exception:
        traceback.print_exc()
        return False


def main():
    import bench_cache_teacher
    import bench_components
    import bench_conv_pallas
    import run_perf_suite
    import run_pretrain_suite

    def p_suite():
        # 5 seed pairs at the s192 (reference-ape) scale: the partial suite
        # shows kd5 +2.7 ADI.10d mean over 2 seeds — n=5 tightens the
        # headline claim either way for ~40 min of extra chip time
        sys.argv = ["run_pretrain_suite.py", "--seeds192", "5"]
        run_pretrain_suite.main()

    def p_perf():
        # bs128 point added: the KD step gains +38% going 16->64 (BASELINE
        # component table); the curve's knee decides the recommended batch
        sys.argv = ["run_perf_suite.py", "--train_ab",
                    "--batches", "16", "64", "128"]
        run_perf_suite.main()

    def p_cache_ab():
        sys.argv = ["bench_cache_teacher.py"]
        bench_cache_teacher.main()

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
        # --fast_pipeline host-throughput A/B on the same BOP tree: 500 TPU
        # steps each arm, sustained img/s decides whether the single-warp
        # path becomes the recommended real-data default (session-5 CPU
        # measurement: 5.4x per-sample; results/host_pipeline.json)
        import train_kd
        for arm, flags in (("slow", []), ("fast", ["--fast_pipeline"])):
            sys.argv = ["train_kd.py",
                        "--config_file", "outputs/bop_synth/config.yaml",
                        "--data", "bop", "--max_iters", "500",
                        "--kd_weight", "0", "--num_workers", "2",
                        "--vis_every", "0",
                        "--working_dir", f"outputs/bop_fast_ab/{arm}/"] + flags
            train_kd.main()

    def p_conv_ab():
        sys.argv = ["bench_conv_pallas.py"]
        bench_conv_pallas.main()

    def p_components():
        sys.argv = ["bench_components.py", "--trace"]
        bench_components.main()

    def p_bench():
        import bench
        sys.argv = ["bench.py"]
        bench.main()

    def p_serving():
        import bench_serving
        sys.argv = ["bench_serving.py"]
        bench_serving.main()

    ok = {}
    ok["suite"] = phase("pretrain suite resume", p_suite)
    ok["perf"] = phase("perf suite", p_perf)
    ok["cache_ab"] = phase("teacher-knowledge cache A/B", p_cache_ab)
    ok["bop_train"] = phase("bop rehearsal train", p_bop_train)
    ok["bop_eval"] = phase("bop rehearsal eval", p_bop_eval)
    ok["bop_fast"] = phase("bop fast-pipeline A/B", p_bop_fast)
    ok["conv_ab"] = phase("conv pallas A/B", p_conv_ab)
    ok["components"] = phase("component probe (+trace)", p_components)
    ok["bench"] = phase("bench headline", p_bench)
    ok["serving"] = phase("serving-artifact bench", p_serving)
    print(f"\nR3-CHAIN4-DONE {ok}", flush=True)


if __name__ == "__main__":
    main()
