"""s2d-student promotion suite: full-length A/B vs darknet_tiny_h.

VERDICT r3 weak #5 / next #4: the space-to-depth-stem student
(`darknet_tiny_h_s2d`, models/darknet.py s2d_stem — same FPN contract as
tiny_h per /root/reference/arguments/argument.py:61-67 FEAT_CHANNELS) beat
tiny_h on BOTH fwd MFU (35.8% vs 30.5% @bs128) and 2,500-step accuracy
(ADI.10d 26.56 vs 16.41, results/perf_suite.json "ab_*") but only as an
experiment flag. This runs the full-length promotion study in ONE process
(one TPU claim): 10k steps x 2 seeds x {tiny_h, s2d} x {baseline, kd1}
on the 1024-image pool, then 384-scene rescores of every checkpoint.

Run: nohup python scripts/run_s2d_suite.py >> results/s2d_suite.log 2>&1 &
CPU smoke: python scripts/run_s2d_suite.py --cpu_smoke
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)


def specs(teacher: str, seeds: int, kd_weight: float):
    out = []
    for s in range(seeds):
        for bb, tag in (("darknet_tiny_h", "tinyh"),
                        ("darknet_tiny_h_s2d", "s2d")):
            out.append((f"{tag}_base_s{s}", dict(backbone=bb, seed=s)))
            if teacher:
                out.append((f"{tag}_kd{kd_weight:g}_s{s}",
                            dict(backbone=bb, seed=s, kd_weight=kd_weight,
                                 backbone_t="darknet53",
                                 weight_file_t=teacher)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", type=str,
                    default="outputs/pretrain2/teacher30k_pt/final.ckpt",
                    help="darknet53 checkpoint for the KD arms; '' skips them")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--kd_weight", type=float, default=1.0)
    ap.add_argument("--rescore_n", type=int, default=384)
    ap.add_argument("--until_ts", type=float, default=0.0,
                    help="unix deadline: stop LAUNCHING runs past it "
                         "(round-end discipline, VERDICT r3 next #1b)")
    ap.add_argument("--out", type=str, default="results/s2d_suite.json")
    ap.add_argument("--trust_summary", action="store_true",
                    help="skip runs already in the summary json even if the "
                         "checkpoint is gone (fresh-VM rounds wipe outputs/)")
    ap.add_argument("--cpu_smoke", action="store_true")
    args = ap.parse_args()

    if args.cpu_smoke:
        os.environ["KD6D_CPU"] = "1"
        args.steps, args.batches, args.seeds = 6, 2, 1
        args.rescore_n = 4
        args.teacher = ""  # KD wiring is the same ns fields the pretrain
        # suite smokes; the CPU KD-step compile alone is ~15 min on 1 core
        args.out = "results/s2d_suite_cpu_smoke.json"

    import memguard
    import train_synthetic_tpu as tst
    from run_post_suite import make_rescorer

    teacher = args.teacher if (args.teacher and
                               os.path.exists(args.teacher)) else ""
    if args.teacher and not teacher:
        print(f"teacher checkpoint missing ({args.teacher}); "
              f"running baseline arms only", flush=True)

    base_ns = tst.build_parser().parse_args([])
    base_ns.steps = args.steps
    base_ns.batches = args.batches
    base_ns.eval_n = 128
    if args.cpu_smoke:
        base_ns.cpu = True
        base_ns.eval_n = 4
        base_ns.steps_per_dispatch = 3
        base_ns.input_res = 128
        base_ns.batch_size = 4

    summary = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            summary = json.load(f)  # resume: finished runs are skipped

    pool_cache, teacher_cache = {}, {}
    rescore_list = []
    for name, spec in specs(teacher, args.seeds, args.kd_weight):
        wd = f"outputs/s2d/{name}/"
        rescore_list.append((name, wd + "final.ckpt", spec["backbone"]))
        if name in summary and (args.trust_summary or
                                os.path.exists(wd + "final.ckpt")):
            print(f"=== {name}: already done, skipping ===", flush=True)
            continue
        if args.until_ts and time.time() > args.until_ts:
            print(f"=== deadline passed; not launching {name} ===", flush=True)
            continue
        ns = copy.copy(base_ns)
        for k, v in spec.items():
            setattr(ns, k, v)
        ns.working_dir = wd
        ns._pool_cache = pool_cache
        ns._teacher_cache = teacher_cache
        print(f"=== run {name}: {spec} ===", flush=True)
        t0 = time.time()
        out = tst.run(ns)
        out["wall_s"] = round(time.time() - t0, 1)
        summary[name] = out
        print(json.dumps({name: out}), flush=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        memguard.after_run(name)  # chain5 died of host-RSS accumulation

    rescore = make_rescorer(args.rescore_n)
    for name, ckpt, backbone in rescore_list:
        key = f"rescore_{name}"
        if key in summary or not os.path.exists(ckpt):
            continue
        if args.until_ts and time.time() > args.until_ts:
            print(f"=== deadline passed; not rescoring {name} ===", flush=True)
            continue
        summary[key] = rescore(ckpt, backbone)
        print(json.dumps({key: summary[key]}), flush=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        memguard.after_run(key)

    # paired table: per seed, s2d minus tinyh on the rescored ADI.10d
    for arm in (["base"] + ([f"kd{args.kd_weight:g}"] if teacher else [])):
        diffs = []
        for s in range(args.seeds):
            a = summary.get(f"rescore_s2d_{arm}_s{s}", {}).get("ADI.10d")
            b = summary.get(f"rescore_tinyh_{arm}_s{s}", {}).get("ADI.10d")
            if a is not None and b is not None:
                diffs.append(a - b)
        if diffs:
            print(f"s2d - tinyh ({arm}) ADI.10d per seed: "
                  f"{[round(d, 2) for d in diffs]}  mean "
                  f"{sum(diffs) / len(diffs):+.2f}", flush=True)
    print("S2D-SUITE-DONE", flush=True)


if __name__ == "__main__":
    main()
