"""Round-3 TPU chain #3, ONE process / one chip claim (run after chain2):

  1. Pallas fused-conv A/B (scripts/bench_conv_pallas.py): the SURVEY §7
     conv-BN-LeakyReLU fusion decision experiment, all tiny-h shapes.
  2. Component probe with profiler trace (scripts/bench_components.py
     --trace): refreshes the BASELINE.md "where the time goes" breakdown
     now that the teacher runs BN-folded.
  3. Optional (--extend_seeds N --extend_tags s192,s512): extend the
     pretrain-suite scarce-data A/B to more seeds (already-done runs are
     skipped inside the suite driver) + their 384-scene rescores.

Phases are isolated: a failure logs and the next phase still runs.

Run: nohup python scripts/run_r3_chain3.py [--extend_seeds 5] \
         > results/r3_chain3.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extend_seeds", type=int, default=0,
                    help="if >3: run pretrain-suite s192/s512 arms for the "
                         "extra seeds (3..N-1)")
    ap.add_argument("--extend_tags", type=str, default="s192")
    ap.add_argument("--skip_conv_ab", action="store_true")
    ap.add_argument("--skip_components", action="store_true")
    args = ap.parse_args()

    import bench_components
    import bench_conv_pallas
    import run_pretrain_suite

    if not args.skip_conv_ab:
        print("===== CHAIN3: conv pallas A/B =====", flush=True)
        try:
            sys.argv = ["bench_conv_pallas.py"]
            bench_conv_pallas.main()
        except Exception:
            traceback.print_exc()

    if not args.skip_components:
        print("===== CHAIN3: component probe (+trace) =====", flush=True)
        try:
            sys.argv = ["bench_components.py", "--trace"]  # JSON -> stdout
            bench_components.main()
        except Exception:
            traceback.print_exc()

    if args.extend_seeds > 3:
        print(f"===== CHAIN3: A/B seed extension to {args.extend_seeds} "
              f"({args.extend_tags}) =====", flush=True)
        try:
            tags = args.extend_tags.split(",")
            only = ",".join(
                f"pt_{tag}_{arm}_s{s}"
                for tag in tags for s in range(3, args.extend_seeds)
                for arm in ("base", "kd1", "kd5"))
            sys.argv = ["run_pretrain_suite.py",
                        "--seeds", str(args.extend_seeds), "--only", only]
            run_pretrain_suite.main()
        except Exception:
            traceback.print_exc()
    print("R3-CHAIN3-DONE", flush=True)


if __name__ == "__main__":
    main()
