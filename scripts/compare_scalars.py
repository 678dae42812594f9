"""Compare two runs' training scalars at matched steps.

Usage: python scripts/compare_scalars.py run_a/scalars.jsonl run_b/scalars.jsonl
Prints cls/reg/grad_norm side by side at common log steps (subsampled).
"""
import json
import sys


def load(path):
    out = {}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if "training/loss_cls" in d:
                out[d["step"]] = d
    return out


a = load(sys.argv[1])
b = load(sys.argv[2])
common = sorted(set(a) & set(b))
if not common:
    print("no common steps; A:", sorted(a)[:3], "B:", sorted(b)[:3])
    sys.exit(1)
sub = common[:: max(1, len(common) // 25)]
print(f"{'step':>6} {'clsA':>9} {'clsB':>9} {'regA':>9} {'regB':>9} "
      f"{'gnA':>9} {'gnB':>9}")
for s in sub:
    print(f"{s:>6} {a[s]['training/loss_cls']:>9.4f} "
          f"{b[s]['training/loss_cls']:>9.4f} "
          f"{a[s]['training/loss_reg']:>9.4f} {b[s]['training/loss_reg']:>9.4f} "
          f"{a[s]['training/grad_norm']:>9.3f} {b[s]['training/grad_norm']:>9.3f}")
