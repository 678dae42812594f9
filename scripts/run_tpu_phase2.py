"""Round TPU phase 2, one process / one chip claim:

  1. Perf suite (scripts/run_perf_suite.py): BN-folding speedups, narrow-
     stage variants, optional 2.5k-step accuracy A/B of the variants.
  2. BOP-on-disk dress rehearsal: `train_kd.py --data bop` against the
     generated outputs/bop_synth tree (real PrefetchLoader + C++ dataplane
     host path) for --bop_iters steps incl. periodic eval — the rehearsal
     that converts "LINEMOD-ready" into a demonstrated fact (VERDICT r2 #4).
  3. test.py eval of the rehearsal checkpoint.
  4. bench.py headline capture.

Each phase is isolated: a failure logs and the next phase still runs
(the chip claim is the scarce resource, not the phases).

Run: nohup python scripts/run_tpu_phase2.py > results/tpu_phase2.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import argparse


def phase(name):
    print(f"\n===== PHASE {name} =====", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bop_iters", type=int, default=2000)
    ap.add_argument("--skip_perf", action="store_true")
    ap.add_argument("--skip_bop", action="store_true")
    ap.add_argument("--skip_bench", action="store_true")
    args = ap.parse_args()

    ok = {}

    if not args.skip_perf:
        phase("perf_suite")
        try:
            import run_perf_suite
            sys.argv = ["run_perf_suite.py", "--train_ab"]
            run_perf_suite.main()
            ok["perf"] = True
        except Exception:
            traceback.print_exc()
            ok["perf"] = False

    if not args.skip_bop:
        phase("bop_rehearsal_train")
        try:
            os.chdir(REPO)
            import train_kd
            sys.argv = ["train_kd.py",
                        "--config_file", "outputs/bop_synth/config.yaml",
                        "--data", "bop", "--max_iters", str(args.bop_iters),
                        "--kd_weight", "0", "--num_workers", "1",
                        "--vis_every", "0",
                        "--working_dir", "outputs/bop_rehearsal/"]
            train_kd.main()
            ok["bop_train"] = True
        except Exception:
            traceback.print_exc()
            ok["bop_train"] = False

        phase("bop_rehearsal_eval")
        try:
            import test as test_cli
            sys.argv = ["test.py",
                        "--config_file", "outputs/bop_synth/config.yaml",
                        "--data", "bop",
                        "--weight_file", "outputs/bop_rehearsal/final.ckpt",
                        "--working_dir", "outputs/bop_rehearsal_eval/"]
            test_cli.main()
            ok["bop_eval"] = True
        except Exception:
            traceback.print_exc()
            ok["bop_eval"] = False

    if not args.skip_bench:
        phase("bench_headline")
        try:
            import bench
            sys.argv = ["bench.py"]
            bench.main()
            ok["bench"] = True
        except Exception:
            traceback.print_exc()
            ok["bench"] = False

    print(f"\nTPU-PHASE2-DONE {ok}", flush=True)


if __name__ == "__main__":
    main()
