#!/bin/bash
# Final round-3 chip chain: one-process A/B suite (7 runs), then the
# component bench and the headline bench.
set -x
cd /root/repo
mkdir -p outputs/ab results

python scripts/run_ab_suite.py --steps 10000 \
  --teacher outputs/ab/teacher30k/final.ckpt \
  --out results/ab_suite.json > results/ab_suite.log 2>&1
sleep 240

python scripts/bench_components.py > results/bench_components_final.json \
  2> results/bench_components_final.err
sleep 240
python bench.py > results/bench_final.json 2> results/bench_final.err
echo SUITE-CHAIN-DONE
