"""One-process pretrained-init KD suite (VERDICT r2 next-round item #1).

The paper's distillation gain lives in data scarcity WITH pretrained
backbones (reference libs/train_libs.py:82-87 loads ImageNet weights;
README.md trains on ~183 LINEMOD images/class). Zero egress blocks
ImageNet, so this suite builds the in-image surrogate end-to-end:

  1. Pretext pretraining: darknet_tiny_h and darknet53 PoseNets trained on
     procedural scenes of classes 1-14 — DISJOINT from the downstream
     target class 0 — 6144 images, 60k steps (v2: the 2048-image/20k-step
     v1 under-trained and its teacher transfer was NEGATIVE, 38 vs 67 ADI).
     Only the backbone (+BN stats) is reused downstream.
  2. Teacher: darknet53 on class 0 (1024 images, 30k steps) from the
     pretrained darknet53 backbone; the KD arms then use whichever of
     {this, the round-2 scratch teacher} scores higher.
  3. Scarce-data A/B: darknet_tiny_h on 192 and 512 class-0 images,
     3 seeds x {baseline, distilled w1, distilled w5}, all arms from the
     pretrained tiny backbone; plus a data-rich (1024-image) pair.
  4. 384-scene rescore of every checkpoint (halves the 128-scene
     binomial noise).

Everything runs sequentially in ONE process: the 15-30 min axon claim
latency is paid once and pools/teacher/XLA programs are shared.

Run: nohup python scripts/run_pretrain_suite.py > results/pretrain_suite.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse
import copy
import json
import time

PRETRAIN_TINY = "outputs/pretrain2/tiny_h/"
PRETRAIN_DN53 = "outputs/pretrain2/darknet53/"
TEACHER = "outputs/pretrain2/teacher30k_pt/"
# round-2/3 scratch teacher (ADI.10d 67.19 @128 / 69.79 @384): the KD arms
# use whichever of {pretrained-init teacher, scratch teacher} scores higher,
# mirroring the reference which simply ships its best teacher checkpoint
SCRATCH_TEACHER = "outputs/ab/teacher30k/final.ckpt"
SCRATCH_TEACHER_ADI10 = 67.19


def suite_specs(args):
    """(name, spec) list. Spec keys override the train_synthetic_tpu parser
    namespace; 'rescore_backbone' marks checkpoints for the final rescore."""
    runs = []
    pre = dict(classes="1-14", batches=args.pretrain_batches,
               steps=args.pretrain_steps, val_freq=0)
    runs.append(("pretrain_tiny", dict(pre, backbone="darknet_tiny_h",
                                       working_dir=PRETRAIN_TINY)))
    runs.append(("pretrain_dn53", dict(pre, backbone="darknet53",
                                       working_dir=PRETRAIN_DN53)))
    runs.append(("teacher30k_pt", dict(
        backbone="darknet53", batches=64, steps=args.teacher_steps,
        backbone_init=PRETRAIN_DN53 + "final.ckpt",
        working_dir=TEACHER, rescore_backbone="darknet53")))

    student = dict(backbone="darknet_tiny_h", steps=args.steps,
                   backbone_init=PRETRAIN_TINY + "final.ckpt",
                   rescore_backbone="darknet_tiny_h")
    kd = dict(weight_file_t="__BEST_TEACHER__")  # resolved after the teacher run
    if getattr(args, "cache_kd", False):
        kd["cache_teacher"] = 1
    for b, tag in ((12, "s192"), (32, "s512"), (64, "rich")):
        if tag == "rich":
            seeds = range(max(2, args.seeds_rich))
        elif tag == "s192":
            seeds = range(max(args.seeds, args.seeds192))
        else:
            seeds = range(args.seeds)
        for s in seeds:
            runs.append((f"pt_{tag}_base_s{s}",
                         dict(student, batches=b, seed=s)))
            runs.append((f"pt_{tag}_kd1_s{s}",
                         dict(student, batches=b, seed=s, kd_weight=1.0, **kd)))
            if tag != "rich":
                runs.append((f"pt_{tag}_kd5_s{s}",
                             dict(student, batches=b, seed=s, kd_weight=5.0, **kd)))
    return runs


def main():
    ap = argparse.ArgumentParser()
    # v2 defaults after the 20k/2048-image v1 failed (teacher-from-pretrain
    # ADI.10d 38 vs 67 scratch; both pretexts still steeply improving at 20k
    # and near-memorizing 146 imgs/class): 3x the pretext data, 3x the steps
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--pretrain_steps", type=int, default=60000)
    ap.add_argument("--pretrain_batches", type=int, default=384)
    ap.add_argument("--teacher_steps", type=int, default=30000)
    ap.add_argument("--seeds", type=int, default=3,
                    help="seed count for the s192/s512 A/B arms (already-"
                         "done runs are skipped, so raising this extends "
                         "an existing suite)")
    ap.add_argument("--seeds192", type=int, default=0,
                    help="extra seed count for the s192 arms only (the "
                         "reference-ape scale where the paper's claim "
                         "lives); effective count = max(seeds, seeds192)")
    ap.add_argument("--seeds_rich", type=int, default=2,
                    help="seed-pair count for the data-rich (1024-image) "
                         "{base, kd1} arms")
    ap.add_argument("--eval_n", type=int, default=128)
    ap.add_argument("--rescore_n", type=int, default=384)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--skip_rescore", action="store_true")
    ap.add_argument("--cache_kd", action="store_true",
                    help="run KD arms with --cache_teacher (frozen-teacher "
                         "knowledge cache; ~3x faster KD runs). Only for a "
                         "short chip window — mixes protocol with "
                         "live-teacher arms already in the summary")
    ap.add_argument("--out", type=str, default="results/pretrain_suite2.json")
    ap.add_argument("--until_ts", type=float, default=0.0,
                    help="unix deadline: stop LAUNCHING runs/rescores past it")
    ap.add_argument("--trust_summary", action="store_true",
                    help="skip any run already in the summary json even if "
                         "its checkpoint is gone (fresh-VM rounds wipe "
                         "outputs/; the recorded metrics stay valid — only "
                         "runs that downstream phases need as checkpoints "
                         "should be re-run, via --only)")
    # smoke-test passthroughs
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--input_res", type=int, default=256)
    args = ap.parse_args()

    import train_synthetic_tpu as tst

    summary = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            summary = json.load(f)

    base_ns = tst.build_parser().parse_args([])
    base_ns.eval_n = args.eval_n
    base_ns.cpu = args.cpu
    base_ns.batch_size = args.batch_size
    base_ns.input_res = args.input_res
    pool_cache, teacher_cache = {}, {}
    keep = set(args.only.split(",")) if args.only else None

    def best_teacher():
        """Pretrained-init teacher if it beat the scratch one, else scratch."""
        pt = summary.get("teacher30k_pt", {}).get("final", {}).get("ADI.10d", 0)
        if pt >= SCRATCH_TEACHER_ADI10 or not os.path.exists(SCRATCH_TEACHER):
            return TEACHER + "final.ckpt"
        print(f"KD arms use the SCRATCH teacher (pt {pt} < "
              f"{SCRATCH_TEACHER_ADI10})", flush=True)
        return SCRATCH_TEACHER

    rescore_list = []
    for name, spec in suite_specs(args):
        wd = spec.get("working_dir", f"outputs/pretrain2/{name}/")
        rb = spec.pop("rescore_backbone", None)
        if rb:
            rescore_list.append((name, wd + "final.ckpt", rb))
        if keep is not None and name not in keep:
            continue
        if name in summary and (args.trust_summary or
                                os.path.exists(wd + "final.ckpt")):
            print(f"=== {name}: already done, skipping ===", flush=True)
            continue
        if args.until_ts and time.time() > args.until_ts:
            print(f"=== deadline passed; not launching {name} ===", flush=True)
            continue
        if spec.get("weight_file_t") == "__BEST_TEACHER__":
            spec["weight_file_t"] = best_teacher()
        if name == "teacher30k_pt":
            # the big pretext pool (classes 1-14) is dead weight from here on;
            # free its ~5 GB of HBM before the class-0 pools arrive
            for k in list(pool_cache):
                if k[-1] == "1-14":
                    del pool_cache[k]
        ns = copy.copy(base_ns)
        for k, v in spec.items():
            setattr(ns, k, v)
        ns.working_dir = wd
        ns._pool_cache = pool_cache
        ns._teacher_cache = teacher_cache
        print(f"=== run {name}: {spec} ===", flush=True)
        t0 = time.time()
        try:
            out = tst.run(ns)
        except FileNotFoundError as e:
            # a missing prerequisite (wiped checkpoint) must not kill the
            # rest of the suite — later arms may not need it (r5 chain:
            # one missing pretext ckpt aborted the whole s192 extension)
            print(f"=== {name} SKIPPED: missing prerequisite ({e}) ===",
                  flush=True)
            continue
        out["wall_s"] = round(time.time() - t0, 1)
        summary[name] = out
        print(json.dumps({name: out}), flush=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        import memguard
        memguard.after_run(name)  # chain5 OOM'd from host-RSS accumulation

    if not args.skip_rescore:
        from run_post_suite import make_rescorer
        rescore = make_rescorer(args.rescore_n)
        for name, ckpt, backbone in rescore_list:
            if not os.path.exists(ckpt):
                continue
            key = f"rescore384_{name}"
            if key in summary:
                continue
            if args.until_ts and time.time() > args.until_ts:
                print(f"=== deadline passed; not rescoring {name} ===",
                      flush=True)
                continue
            summary[key] = rescore(ckpt, backbone)
            print(json.dumps({key: summary[key]}), flush=True)
            with open(args.out, "w") as f:
                json.dump(summary, f, indent=1)
            import memguard
            memguard.after_run(key)
    print("PRETRAIN-SUITE-DONE", flush=True)


if __name__ == "__main__":
    main()
