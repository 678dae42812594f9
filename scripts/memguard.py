"""Host-RSS telemetry + pressure valve for long one-process chip chains.

The round-3 chain5 process accumulated 130 GB of anon host memory over 31
in-process runs and was OOM-killed mid-rescore (dmesg 2026-08-19 08:15;
the box has 128 GB and no swap). Exact per-run growth source still
unattributed — this logs RSS after every run so the growth curve lands in
the chain logs, and clears the jax executable caches (the persistent
on-disk compilation cache makes the re-trace cheap) plus gc when RSS
crosses a threshold, well before the OOM killer does it the hard way.
"""
from __future__ import annotations


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / (1024.0 ** 2)
    return 0.0


def after_run(tag: str, clear_above_gb: float = 40.0) -> float:
    import gc
    gc.collect()
    r = rss_gb()
    print(f"[memguard] rss {r:.1f} GB after {tag}", flush=True)
    if r > clear_above_gb:
        import jax
        jax.clear_caches()
        gc.collect()
        r2 = rss_gb()
        print(f"[memguard] rss {r:.1f} GB > {clear_above_gb:.0f} GB cap: "
              f"cleared jax caches -> {r2:.1f} GB", flush=True)
        return r2
    return r
