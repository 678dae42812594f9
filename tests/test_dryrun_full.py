"""Production-shaped multi-device dry run (VERDICT r4 next #4).

`__graft_entry__.dryrun_full(8)` compiles + executes ONE KD training step
at the real program shapes — 256² crops, all 15 foreground classes,
darknet53 teacher, default vote/teacher-cell caps — over an 8-device CPU
Mesh('data') in a scrubbed subprocess, and asserts finite loss + exact
post-step parameter replication (gradient sync happened).

Slow: the full KD-step CPU compile dominates (~15-20 min on one core).
The driver-run `dryrun_multichip` stays toy-shaped so the round artifact
is fast; this test is the production-shape evidence.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_full_8():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "dryrun_full", "8"],
        cwd=REPO,
        env=dict(os.environ,
                 XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"),
                 JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu"),
        capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "dryrun_full(8) OK" in r.stdout, r.stdout[-2000:]
