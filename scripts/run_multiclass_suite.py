"""Multi-class KD end-to-end (VERDICT r4 next-round item #1).

BASELINE.json config 4 names "all LINEMOD classes, data-parallel" as a
target configuration and the reference is built for N_CLASS=16
(/root/reference/configs/ape.yaml:16; per-class postprocess loop
/root/reference/postprocess/postprocess.py:95-202; per-class eval scalars
/root/reference/libs/eval_libs.py:112-146). Every training artifact in
results/ so far is single-class. This suite runs the full 15-foreground-
class configuration end-to-end on the chip:

  1. mc_teacher30k : darknet53 on classes 0-14, 3072-image pool, 30k steps
  2. mc_base_s{0,1}: darknet_tiny_h students, 10k steps, same pool
  3. mc_kd5_s{0,1} : + KD (kd_weight 5, teacher_class=pred — the reference
                     postprocess_kd semantics where the teacher votes its
                     own PREDICTED class channel, required for honest
                     multi-class KD; previously unit-tested only)
  4. mc_kd5gt_s0   : ablation — teacher_class=gt on the same seed, to
                     record what the cheap single-object-parity mode does
                     under 15 classes

Evaluation is the scan evaluator at 450 scenes (~30/class) with the
per-class ADI/AUC/REP table (train_synthetic_tpu results['per_class']).
Everything runs in ONE process (single TPU claim; pools/teacher shared).

Run:  nohup python scripts/run_multiclass_suite.py >> results/multiclass_suite.log 2>&1 &
CPU smoke: python scripts/run_multiclass_suite.py --cpu_smoke
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

def specs(args):
    p = args.prefix
    teacher_wd = f"outputs/multiclass/{p}mc_teacher30k/"
    tspec = dict(backbone="darknet53", steps=args.teacher_steps,
                 working_dir=teacher_wd)
    sspec = {}
    if args.teacher_init:
        # v2 protocol: warm-start from the classes-1-14 pretext backbone
        # (run_pretrain_suite pretrain_dn53) — the round-5 v1 run showed
        # 15-class-from-scratch at 30k steps plateaus at reg ~3.6 and
        # near-zero eval (results/multiclass_suite.json); round-4's pretexts
        # needed 60k steps to reach reg ~0.9 / ADI 19-39 on 14 classes.
        tspec["backbone_init"] = args.teacher_init
    if args.student_init:
        sspec["backbone_init"] = args.student_init
    out = [(f"{p}mc_teacher30k", tspec)]
    kd = dict(kd_weight=5.0, backbone_t="darknet53",
              weight_file_t=teacher_wd + "final.ckpt")
    for s in range(args.seeds):
        out.append((f"{p}mc_base_s{s}", dict(seed=s, **sspec)))
        out.append((f"{p}mc_kd5_s{s}",
                    dict(seed=s, teacher_class="pred", **sspec, **kd)))
    out.append((f"{p}mc_kd5gt_s0",
                dict(seed=0, teacher_class="gt", **sspec, **kd)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=str, default="0-14",
                    help="all 15 LINEMOD-style foreground classes")
    ap.add_argument("--batches", type=int, default=192,
                    help="192 x bs16 = 3072 pool images (~205/class, the "
                         "LINEMOD per-class training scale)")
    ap.add_argument("--teacher_steps", type=int, default=30000)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--eval_n", type=int, default=450)
    ap.add_argument("--until_ts", type=float, default=0.0,
                    help="unix deadline: stop LAUNCHING runs past it")
    ap.add_argument("--out", type=str, default="results/multiclass_suite.json")
    ap.add_argument("--prefix", type=str, default="",
                    help="run-name prefix, e.g. 'v2_' for the pretext-init "
                         "protocol (so v1/v2 coexist in summaries)")
    ap.add_argument("--teacher_init", type=str, default="",
                    help="backbone_init ckpt for the darknet53 teacher "
                         "(outputs/pretrain2/darknet53/final.ckpt)")
    ap.add_argument("--student_init", type=str, default="",
                    help="backbone_init ckpt for the tiny_h students "
                         "(outputs/pretrain2/tiny_h/final.ckpt)")
    ap.add_argument("--cpu_smoke", action="store_true")
    args = ap.parse_args()

    if args.cpu_smoke:
        os.environ["KD6D_CPU"] = "1"
        args.batches, args.teacher_steps, args.steps = 2, 6, 6
        args.seeds, args.eval_n = 1, 8
        args.out = "results/multiclass_suite_cpu_smoke.json"

    import memguard
    import train_synthetic_tpu as tst

    base_ns = tst.build_parser().parse_args([])
    base_ns.classes = args.classes
    base_ns.batches = args.batches
    base_ns.eval_n = args.eval_n
    if args.cpu_smoke:
        base_ns.cpu = True
        base_ns.steps_per_dispatch = 3
        base_ns.input_res = 128
        base_ns.batch_size = 4
        base_ns.backbone_t = "darknet_tiny"  # CPU darknet53 KD compile ~15min

    summary = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            summary = json.load(f)  # resume: finished runs are skipped

    pool_cache, teacher_cache = {}, {}
    for name, spec in specs(args):
        wd = spec.get("working_dir", f"outputs/multiclass/{name}/")
        if name in summary and (name != f"{args.prefix}mc_teacher30k"
                                or os.path.exists(wd + "final.ckpt")):
            print(f"=== {name}: already done, skipping ===", flush=True)
            continue
        if args.until_ts and time.time() > args.until_ts:
            print(f"=== deadline passed; not launching {name} ===", flush=True)
            continue
        ns = copy.copy(base_ns)
        for k, v in spec.items():
            setattr(ns, k, v)
        if args.cpu_smoke:
            if "backbone_t" in spec:
                ns.backbone_t = "darknet_tiny"
            if name == f"{args.prefix}mc_teacher30k":
                ns.backbone = "darknet_tiny"
        ns.steps = spec.get("steps", args.steps)
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
        memguard.after_run(name)

    # the published table: per-class ADI.10d for every arm + paired deltas
    def pcls(name):
        return summary.get(name, {}).get("final", {}).get("per_class", {})

    classes = sorted(set().union(*[pcls(n) for n, _ in specs(args)]))
    if classes:
        print("\nper-class ADI.10d table (multi-class end-to-end):",
              flush=True)
        hdr = ["class"] + [n for n, _ in specs(args) if pcls(n)]
        print("  " + "  ".join(f"{h:>14s}" for h in hdr), flush=True)
        for c in classes:
            row = [c] + [str(pcls(n).get(c, {}).get("ADI.10d", "-"))
                         for n in hdr[1:]]
            print("  " + "  ".join(f"{str(v):>14s}" for v in row), flush=True)
    for s in range(args.seeds):
        b = summary.get(f"{args.prefix}mc_base_s{s}",
                        {}).get("final", {}).get("ADI.10d")
        k = summary.get(f"{args.prefix}mc_kd5_s{s}",
                        {}).get("final", {}).get("ADI.10d")
        if b is not None and k is not None:
            print(f"seed {s}: kd5(pred) - base ADI.10d = {k - b:+.2f} "
                  f"({k} vs {b})", flush=True)
    print("MULTICLASS-SUITE-DONE", flush=True)


if __name__ == "__main__":
    main()
