"""Collect the final-JSON lines of results/ab_*.log into a markdown table.

Each scripts/train_synthetic_tpu.py run ends with one JSON line:
  {"final": {"ADI.05d": ..., ...}, "backbone": ..., "kd_weight": ..., ...}
"""
from __future__ import annotations

import glob
import json
import os
import sys


def last_json(path: str):
    out = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"final"' in line:
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return out


def suite_rows(pattern: str = "results/ab_*.json"):
    """Rows from one-process suite JSONs ({run_name: {final: ...}})."""
    rows = []
    for path in sorted(glob.glob(pattern)):
        try:
            d = json.load(open(path))
        except json.JSONDecodeError:
            continue
        for name, j in d.items():
            if isinstance(j, dict) and "final" in j:
                rows.append((name, j))
    return rows


def main(pattern: str = "results/ab_*.log"):
    rows = []
    for path in sorted(glob.glob(pattern)):
        j = last_json(path)
        name = os.path.basename(path).replace("ab_", "").replace(".log", "")
        if j is None:
            rows.append((name, None))
            continue
        rows.append((name, j))
    seen = {n for n, _ in rows}
    rows += [(n, j) for n, j in suite_rows() if n not in seen]
    cols = ["ADI.05d", "ADI.10d", "ADI.20d", "REP05px", "REP10px", "REP20px"]
    print("| Run | backbone | kd_w | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 3))
    for name, j in rows:
        if j is None:
            print(f"| {name} | (no final JSON — run incomplete/crashed) |"
                  + " |" * (len(cols) + 1))
            continue
        f = j["final"]
        vals = " | ".join(f"{f.get(c, 0.0):.2f}" for c in cols)
        print(f"| {name} | {j.get('backbone','?')} | {j.get('kd_weight','?'):g} "
              f"| {vals} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
