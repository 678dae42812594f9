"""Augment results/max_throughput.json with steady-state throughput.

The train loop's `ips` lines are cumulative (images since the meter reset
divided by elapsed, so the first dispatch's compile drags the average).
Steady-state is recovered from the last two cumulative points of each arm:

    t_k = images_k / ips_k       (elapsed at step k)
    steady = (images_b - images_a) / (t_b - t_a)

Usage: python scripts/analyze_max_throughput.py [--log results/r4e_chain.log]
Prints the table and rewrites results/max_throughput.json in place.
"""
from __future__ import annotations

import argparse
import json
import re


def parse(log_path: str):
    runs, cur, bs = {}, None, 0
    run_re = re.compile(r"=== run (\w+): .*'batch_size': (\d+)")
    ips_re = re.compile(r"step (\d+)/\d+ .* ips ([\d.]+)")
    for line in open(log_path):
        m = run_re.search(line)
        if m:
            cur, bs = m.group(1), int(m.group(2))
            runs.setdefault(cur, [])
            continue
        m = ips_re.search(line)
        if m and cur is not None:
            step, ips = int(m.group(1)), float(m.group(2))
            runs[cur].append((step * bs, ips))
    return runs


def steady(points, tail=3):
    """Least-squares slope of images-vs-time over the last `tail` points."""
    pts = [(img / ips, img) for img, ips in points[-tail:] if ips > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    mt = sum(t for t, _ in pts) / n
    mi = sum(i for _, i in pts) / n
    num = sum((t - mt) * (i - mi) for t, i in pts)
    den = sum((t - mt) ** 2 for t, _ in pts)
    return round(num / den, 1) if den else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="results/r4e_chain.log")
    ap.add_argument("--out", default="results/max_throughput.json")
    args = ap.parse_args()

    runs = parse(args.log)
    with open(args.out) as f:
        summary = json.load(f)
    for name, pts in runs.items():
        if name not in summary or not pts:
            continue
        s = steady(pts)
        summary[name]["steady_img_s"] = s
        summary[name]["cumulative_img_s_final"] = pts[-1][1]
        w = summary[name].get("wall_s")
        n = summary[name].get("images")
        summary[name]["sustained_incl_compile_eval"] = (
            round(n / w, 1) if w else None)
        print(f"{name:24s} steady {s} img/s   cumulative-final {pts[-1][1]}"
              f"   wall-sustained {summary[name]['sustained_incl_compile_eval']}")
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
