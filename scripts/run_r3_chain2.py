"""Round-3 TPU chain, ONE process / one chip claim:

  1. Pretrained-init KD suite v2 (scripts/run_pretrain_suite.py): 60k-step
     6144-image pretexts, teacher comparison, 22 scarce-data A/B arms,
     384-scene rescore.
  2. Phase 2 (scripts/run_tpu_phase2.py): perf suite (BN folding + narrow-
     stage variants + 2.5k-step accuracy A/B), BOP-on-disk rehearsal
     (train_kd.py --data bop + test.py), bench.py capture.

Phases are isolated: a failure logs and the next phase still runs.

Run: nohup python scripts/run_r3_chain2.py > results/r3_chain2.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)


def main():
    import run_pretrain_suite
    import run_tpu_phase2

    print("===== CHAIN: pretrain suite v2 =====", flush=True)
    try:
        sys.argv = ["run_pretrain_suite.py"]
        run_pretrain_suite.main()
    except Exception:
        traceback.print_exc()

    print("===== CHAIN: tpu phase 2 =====", flush=True)
    try:
        sys.argv = ["run_tpu_phase2.py"]
        run_tpu_phase2.main()
    except Exception:
        traceback.print_exc()
    print("R3-CHAIN2-DONE", flush=True)


if __name__ == "__main__":
    main()
