"""Paired-seed analysis of the pretrained-init KD suite.

Reads results/pretrain_suite2.json (scripts/run_pretrain_suite.py) and
prints, per data regime (s192/s512/rich) and kd weight (1/5), the paired
per-seed deltas distilled - baseline on ADI/REP metrics — for both the
128-scene training-time eval ("final") and the 384-scene rescore — plus
the mean paired delta and its seed-to-seed spread. The paired layout
cancels pool/eval noise shared within a seed; the spread is the honest
error bar for the KD claim (STATUS.md protocol note, round 3).

Run: python scripts/analyze_pretrain_suite.py [path]
"""
from __future__ import annotations

import json
import math
import sys
from collections import defaultdict

METRICS = ("ADI.05d", "ADI.10d", "REP05px")
METRICS_RESCORE = ("ADI.10d", "AUC", "REP05px")  # 384-scene rescore adds AUC


def get(d, name, kind):
    if kind == "final":
        return d.get(name, {}).get("final")
    return d.get(f"rescore384_{name}")


def pairs(d, tag, w, kind):
    out = []
    s = 0
    while True:
        b = get(d, f"pt_{tag}_base_s{s}", kind)
        k = get(d, f"pt_{tag}_{w}_s{s}", kind)
        if b is None or k is None:
            break
        out.append((s, b, k))
        s += 1
    return out


def fmt_stats(deltas):
    n = len(deltas)
    m = sum(deltas) / n
    sd = math.sqrt(sum((x - m) ** 2 for x in deltas) / max(n - 1, 1))
    sem = sd / math.sqrt(n)
    return m, sd, sem


def perm_p(deltas):
    """Exact paired sign-flip permutation p-value (two-sided) for
    mean(delta) != 0: with n seed pairs there are 2^n equally-likely sign
    assignments under the no-effect null; p = fraction whose |mean| >=
    the observed |mean|. Exact and assumption-free at these tiny n."""
    n = len(deltas)
    if n < 2:
        return float("nan")
    obs = abs(sum(deltas))
    hits = 0
    for bits in range(1 << n):
        s = sum(d if bits >> i & 1 else -d for i, d in enumerate(deltas))
        if abs(s) >= obs - 1e-12:
            hits += 1
    return hits / (1 << n)


def main(path="results/pretrain_suite2.json"):
    d = json.load(open(path))
    for kind in ("final", "rescore384"):
        print(f"\n== {kind} ({'128' if kind == 'final' else '384'}-scene eval)"
              f" ==")
        for tag in ("s192", "s512", "rich"):
            for w in ("kd1", "kd5"):
                pr = pairs(d, tag, w, kind)
                if not pr:
                    continue
                metrics = METRICS if kind == "final" else METRICS_RESCORE
                metrics = tuple(m for m in metrics if m in pr[0][1])
                print(f"\n{tag} {w}: {len(pr)} seed pairs")
                header = "  seed " + "".join(f"{m:>22s}" for m in metrics)
                print(header + "   (base -> kd, delta)")
                agg = defaultdict(list)
                for s, b, k in pr:
                    row = f"  {s:4d} "
                    for m in metrics:
                        delta = k[m] - b[m]
                        agg[m].append(delta)
                        row += f"  {b[m]:6.2f}->{k[m]:6.2f} {delta:+6.2f}"
                    print(row)
                summary = "  mean "
                for m in metrics:
                    mu, sd, sem = fmt_stats(agg[m])
                    summary += f"  {mu:+6.2f} (sd {sd:5.2f}, sem {sem:4.2f})"
                print(summary)
                pline = "  perm "
                for m in metrics:
                    pline += f"  p={perm_p(agg[m]):.3f}" + " " * 13
                print(pline + " (exact sign-flip, two-sided)")
    # teacher context
    for name in ("teacher30k_pt",):
        f = d.get(name, {}).get("final")
        r = d.get(f"rescore384_{name}")
        if f:
            print(f"\n{name}: final ADI.10d {f['ADI.10d']}"
                  + (f", rescore384 ADI.10d {r['ADI.10d']}" if r else ""))

    # int8-teacher arms (chain 2, results/quant_s192_ab.json): paired
    # per-seed int8-vs-folded deltas on the 384-scene rescore — does PTQ
    # preserve the end-to-end KD outcome where the effect lives?
    import os
    qpath = os.path.join(os.path.dirname(path), "quant_s192_ab.json")
    if os.path.exists(qpath):
        q = json.load(open(qpath))
        pr = []
        s = 0
        while True:
            fold = d.get(f"rescore384_pt_s192_kd1_s{s}")
            int8 = q.get(f"rescore384_pt_s192_kd1q_s{s}")
            if fold is None or int8 is None:
                break
            pr.append((s, fold, int8))
            s += 1
        if pr:
            print(f"\n== s192 kd1: int8 teacher vs BN-folded teacher "
                  f"({len(pr)} paired seeds, 384-scene rescore) ==")
            metrics = tuple(m for m in METRICS_RESCORE if m in pr[0][1])
            agg = defaultdict(list)
            for s, f8, i8 in pr:
                row = f"  {s:4d} "
                for m in metrics:
                    delta = i8[m] - f8[m]
                    agg[m].append(delta)
                    row += f"  {f8[m]:6.2f}->{i8[m]:6.2f} {delta:+6.2f}"
                print(row)
            summary = "  mean "
            for m in metrics:
                mu, sd, sem = fmt_stats(agg[m])
                summary += f"  {mu:+6.2f} (sd {sd:5.2f}, sem {sem:4.2f})"
            print(summary)


if __name__ == "__main__":
    main(*sys.argv[1:])
