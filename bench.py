"""Throughput benchmark on real hardware.

Measures the headline configuration of the reference (train.sh row 2):
1. KD training — darknet53 teacher forward + teacher-knowledge voting +
   darknet_tiny_h student forward/backward + AdamW — batch 16 at 256x256.
2. Pure student (darknet_tiny_h) inference throughput, the second half of
   BASELINE.json's metric definition.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "infer_images_per_sec": N, "platform": ..., "pallas": bool, ...}

vs_baseline: the reference publishes no throughput (SURVEY §6), so the
baseline is a FLOPs-derived V100 estimate: the compiled step's exact FLOP
count (XLA cost analysis) over V100 fp32 peak 15.7 TFLOP/s at an optimistic
50% MFU (dense ConvNet). Target from BASELINE.md is 5x that estimate;
vs_baseline = ours / (5 * v100_estimate).

Fail-soft policy (VERDICT rounds 1+3): a benchmark must degrade, never die.
Three layers, in order of the failures actually observed on this machine:
  1. relay outage — the axon tunnel port is closed; jax device init would
     BLOCK forever, so a TCP pre-probe waits a bounded window then forces CPU.
  2. claim unavailable — init succeeds but the FIRST device op raises
     FAILED_PRECONDITION while another process holds the one-at-a-time TPU
     claim (BENCH_r03 failure mode). A tiny probe op retries with backoff
     across the 15-30 min claim-release window, then degrades to CPU.
  3. mid-run device failure — any exception during the TPU measurement
     degrades to a fresh CPU re-run instead of a red exit.
On any CPU fallback the JSON carries a `note` and the most recent on-chip
capture, and `record_chip_capture` refuses to let an implausible TPU capture
overwrite the self-maintained perf record (VERDICT r3 weak #2).
"""
from __future__ import annotations

import json
import os
import sys
import time

V100_FP32_PEAK = 15.7e12
V100_MFU = 0.5
TARGET_MULTIPLE = 5.0

# record_chip_capture plausibility floors: the slowest sane on-chip KD-step
# capture ever observed is ~420 img/s host-driven (STATUS round 3); anything
# under these is a degraded measurement (claim/relay contention, host-resident
# params re-shipped through the tunnel), not real chip performance.
MIN_TPU_IPS = 100.0
MIN_FRACTION_OF_RECORD = 0.2


def _tunnel_up(port: int = 8082, timeout_s: float = 3.0) -> bool:
    """TCP-probe the axon relay's first loopback port. When the relay is
    DOWN, jax device init does not raise — it BLOCKS forever (observed
    2026-08-17 outage, CLAUDE.md), so fail-soft needs this pre-check."""
    import socket
    if not os.path.exists(os.path.expanduser("~/.tpu_init.py")):
        return True  # no axon relay in this image: nothing to probe
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout_s):
            return True
    except OSError:
        return False


def _init_platform():
    """Initialize a backend; fall back to CPU if the relay is down
    (single-process chip with minutes-long claim release, see CLAUDE.md)."""
    import jax
    if os.environ.get("KD6D_CPU", "") == "1":
        jax.config.update("jax_platforms", "cpu")
        return jax, jax.devices()[0].platform
    if not _tunnel_up():
        # relay outage: wait a bounded window (it may be flapping), then
        # degrade to CPU instead of hanging the whole benchmark run
        deadline = time.time() + float(
            os.environ.get("KD6D_BENCH_TUNNEL_WAIT", "600"))
        print("[bench] axon relay port closed; waiting for tunnel",
              file=sys.stderr, flush=True)
        while time.time() < deadline and not _tunnel_up():
            time.sleep(15)
        if not _tunnel_up():
            print("[bench] tunnel still down; falling back to CPU",
                  file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")
            return jax, jax.devices()[0].platform
    try:
        dev = jax.devices()[0]
        return jax, dev.platform
    except Exception as e:  # noqa: BLE001 — axon claim/registration failures
        print(f"[bench] device init failed ({type(e).__name__}: {e}); "
              f"falling back to CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return jax, jax.devices()[0].platform


def _probe_first_device_op(jax) -> bool:
    """Run one tiny device op before committing to the TPU measurement.

    jax.devices() succeeding does NOT mean the chip is usable: when another
    process holds the single-process TPU claim the first device_put raises
    FAILED_PRECONDITION (exactly how BENCH_r03.json went red). The claim
    releases 15-30 min after the holder exits (CLAUDE.md), so retry with a
    bounded backoff before giving up."""
    import numpy as np
    deadline = time.time() + float(
        os.environ.get("KD6D_BENCH_CLAIM_WAIT", "1200"))
    attempt = 0
    while True:
        try:
            x = jax.device_put(np.ones((8,), np.float32))
            jax.block_until_ready(x * 2.0)
            return True
        except Exception as e:  # noqa: BLE001 — backend errors are not typed
            attempt += 1
            if time.time() >= deadline:
                print(f"[bench] device probe still failing after "
                      f"{attempt} attempts ({type(e).__name__}: {e})",
                      file=sys.stderr, flush=True)
                return False
            print(f"[bench] device probe failed ({type(e).__name__}); "
                  f"retrying while the TPU claim releases",
                  file=sys.stderr, flush=True)
            time.sleep(60)


def _to_cpu_inprocess(jax) -> bool:
    """Best-effort in-process platform switch for imported callers."""
    try:
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform == "cpu"
    except Exception:  # noqa: BLE001
        return False


def _reexec_cpu(note: str) -> None:
    """Replace this process with a fresh CPU-forced bench run. A fresh
    interpreter is the only fully reliable way off an initialized-but-broken
    axon backend; only taken when bench.py runs as __main__."""
    env = dict(os.environ, KD6D_CPU="1", KD6D_BENCH_NOTE=note)
    print(f"[bench] {note}; re-executing on CPU", file=sys.stderr, flush=True)
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)] + sys.argv[1:], env)


def record_chip_capture(result: dict, last_chip_path: str,
                        captured_at: str | None = None):
    """Persist an on-chip capture — unless it is implausible.

    VERDICT r3 weak #2: a 3.68 img/s capture (host-resident folded teacher
    params re-shipped through the tunnel every step) silently overwrote the
    1,005 img/s record. Guard: a new TPU capture below the absolute floor
    (MIN_TPU_IPS on either the host-driven or pure-device rate) or below
    MIN_FRACTION_OF_RECORD of the stored record is written to a separate
    bench_anomaly_<ts>.json with a note instead of replacing the record.

    Returns (path_written, payload). The payload carries `anomaly_note`
    when quarantined.
    """
    captured_at = captured_at or time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                               time.gmtime())
    payload = dict(result, captured_at=captured_at)
    try:
        with open(last_chip_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = None

    reasons = []
    val = float(result.get("value") or 0.0)
    dev = result.get("device_step_images_per_sec")
    if val < MIN_TPU_IPS:
        reasons.append(f"host-driven rate {val} img/s is below the "
                       f"{MIN_TPU_IPS:.0f} img/s TPU plausibility floor")
    if dev is not None and float(dev) < MIN_TPU_IPS:
        reasons.append(f"pure-device rate {dev} img/s is below the "
                       f"{MIN_TPU_IPS:.0f} img/s TPU plausibility floor")
    prev_val = float(prev.get("value") or 0.0) if prev else 0.0
    # the relative-drop check only makes sense against a record measured at
    # the same configuration: a legitimate run at a smaller BENCH_BATCH /
    # BENCH_RES would otherwise be quarantined forever (advisor r4). Records
    # predating the config fields were all taken at the (16, 256) defaults.
    def _cfg(d):
        return (d.get("batch_size", 16), d.get("input_res", 256))
    if (prev_val > 0.0 and _cfg(prev or {}) == _cfg(result)
            and val < MIN_FRACTION_OF_RECORD * prev_val):
        reasons.append(f"{val} img/s is under {MIN_FRACTION_OF_RECORD:.0%} "
                       f"of the stored record {prev_val} img/s")

    os.makedirs(os.path.dirname(last_chip_path), exist_ok=True)
    if reasons:
        payload["anomaly_note"] = (
            "implausible capture NOT promoted to the last-chip record: "
            + "; ".join(reasons))
        ts = captured_at.replace(":", "").replace("-", "")
        path = os.path.join(os.path.dirname(last_chip_path),
                            f"bench_anomaly_{ts}.json")
    else:
        path = last_chip_path
    with open(path, "w") as f:
        json.dump(payload, f)
    return path, payload


def _pallas_value_check(jax):
    """Compiled-mode (non-interpret) Pallas-vs-pure-JAX Sinkhorn value check
    on the current backend. Returns max |diff| or None if Pallas is off."""
    import numpy as np

    from kd6d_pose_adlp_tpu.ops import sinkhorn as sk
    from kd6d_pose_adlp_tpu.ops.sinkhorn_pallas import (
        pallas_tpu_ok, sinkhorn_divergence_pallas)

    if not pallas_tpu_ok():
        return None
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(16, 64, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(16, 64, 2)).astype(np.float32)
    a = rng.uniform(0.1, 1.0, size=(16, 64)).astype(np.float32)
    b = rng.uniform(0.1, 1.0, size=(16, 64)).astype(np.float32)
    a[:, 40:] = 0.0  # realistic zero-weight padding
    ref = np.asarray(sk.batched_samples_loss(x, y, a, b, gtype="sinkhorn"))
    got = np.asarray(sinkhorn_divergence_pallas(x, y, a, b))
    diff = float(np.max(np.abs(got - ref) / (np.abs(ref) + 1e-6)))
    assert diff < 1e-2, f"Pallas/JAX Sinkhorn mismatch: rel diff {diff}"
    return diff


def _measure(jax, platform: str) -> dict:
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.steps import (
                                                 build_train_step,
                                                 create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.ops.sinkhorn_pallas import pallas_tpu_ok

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    input_res = int(os.environ.get("BENCH_RES", "256"))
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h",
                                   compute_dtype="bfloat16",
                                   input_res=input_res))
    cfg_t = Config(model=ModelConfig(backbone="darknet53",
                                     compute_dtype="bfloat16",
                                     input_res=input_res))
    n_fg = cfg.data.n_fg

    pallas_diff = _pallas_value_check(jax)

    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0, seed=0)
    consts = ds.consts()
    batch = ds.batch(range(batch_size), train=True)
    batch = jax.device_put(batch)

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    teacher_net = PoseNet(cfg=cfg_t.model, n_fg=n_fg)
    t_vars = teacher_net.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.model.input_res, cfg.model.input_res, 3)))
    fold_bn = os.environ.get("BENCH_FOLD_BN", "1") == "1"
    if fold_bn:
        # production teacher path (train_kd.py --fold_teacher_bn, default):
        # the frozen teacher's BN folded into conv weights at load time
        import dataclasses

        from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
        t_vars = fold_batchnorm(t_vars)
        cfg_t = cfg_t.replace(model=dataclasses.replace(
            cfg_t.model, bn_folded=True))
        teacher_net = PoseNet(cfg=cfg_t.model, n_fg=n_fg)
    # fold_batchnorm returns HOST numpy arrays. Forgetting this device_put
    # made every benched step re-ship the 41.6M-param teacher (~166 MB)
    # through the remote tunnel: the deterministic 3.68 img/s anomaly of
    # 2026-08-19 (results/bench_anomaly_*.json). The production loops
    # already do this (engine/loop.py:144).
    t_vars = jax.device_put(t_vars)
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)

    step_fn = jax.jit(build_train_step(cfg, cfg_t, consts, net, teacher_net,
                                       opt, distill=True), donate_argnums=(0,))

    # FLOP count of the compiled step for the V100-derived baseline; the AOT
    # lowering shares the jit cache, so this is the only compilation
    t_compile0 = time.perf_counter()
    try:
        lowered = step_fn.lower(state, t_vars, batch, jax.random.PRNGKey(2))
        flops_per_step = float(lowered.compile().cost_analysis()["flops"])
    except Exception:
        flops_per_step = float("nan")

    # On the CPU-fallback path (tunnel outage / claim unavailable) the full
    # darknet53+student step runs ~100x slower than on the chip: shrink the
    # measurement so the degraded benchmark still completes in minutes.
    on_cpu = platform == "cpu"

    rng = jax.random.PRNGKey(2)
    # warmup / compile
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, t_vars, batch, sub)
    jax.block_until_ready(metrics["loss_total"])
    compile_wall_s = time.perf_counter() - t_compile0  # compile + 3 warmups

    n_steps = int(os.environ.get("BENCH_STEPS", "4" if on_cpu else "30"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, t_vars, batch, sub)
    jax.block_until_ready(metrics["loss_total"])
    dt = time.perf_counter() - t0
    ips = batch_size * n_steps / dt

    # Pure device step rate via the production multi-step (K steps scanned
    # in one dispatch, state threading through — replay-proof and free of
    # the tunnel's per-dispatch overhead); `ips` above stays the headline
    # because it reflects what a host-driven loop actually sustains
    if on_cpu:
        # the scanned multi-step is a TPU-dispatch-overhead measurement; on
        # the CPU fallback it runs pathologically slowly (~320 s/step
        # observed) and would blow the degraded benchmark's time budget
        device_ips = None
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    else:
        from kd6d_pose_adlp_tpu.engine.steps import build_multi_step
        K_STEP = 8
        multi = jax.jit(build_multi_step(cfg, cfg_t, consts, net, teacher_net,
                                         opt, distill=True, pool_size=1),
                        donate_argnums=(0,), static_argnums=(5,))
        pool1 = jax.tree_util.tree_map(lambda x: x[None], batch)
        mstate, mrng, m = multi(state, t_vars, pool1, rng,
                                jnp.zeros((), jnp.int32), K_STEP)
        jax.block_until_ready(m["loss_total"])
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            mstate, mrng, m = multi(mstate, t_vars, pool1, mrng,
                                    jnp.zeros((), jnp.int32), K_STEP)
        jax.block_until_ready(m["loss_total"])
        device_ips = batch_size * K_STEP * reps / (time.perf_counter() - t0)

    # --- pure student inference (darknet_tiny_h forward, eval mode) ---
    infer_batch = int(os.environ.get("BENCH_INFER_BATCH", "64"))
    if not on_cpu:
        # state was donated into the multi-step above — use its successor
        variables = {"params": mstate.params,
                     "batch_stats": mstate.batch_stats}
    images = jnp.asarray(
        np.tile(np.asarray(batch.images, np.float32),
                (infer_batch // batch_size + 1, 1, 1, 1))[:infer_batch]
    ).astype(jnp.float32)
    # Scan-chained timing: K forwards with a true data dependence inside
    # ONE dispatched program. Host-looped calls with repeated (executable,
    # args) replay from a cache in the remote runtime and report impossible
    # rates (226%-"MFU" forwards in scripts/bench_components.py), and even
    # input-cycling doesn't defeat it; the chained scan measures pure
    # device throughput.
    K_INF = int(os.environ.get("BENCH_INFER_STEPS", "4" if on_cpu else "32"))

    @jax.jit
    def infer_k(v, x):
        def body(c, _):
            cls, reg = net.apply(v, c, train=False)
            # 1e-6, not tinier: a bump below f32 eps underflows (c+bump==c),
            # the carry freezes, and content-addressed replay kicks in
            bump = (cls.mean() * 1e-6).astype(c.dtype)
            return c + bump, None
        c, _ = jax.lax.scan(body, x, None, length=K_INF)
        return c

    out = infer_k(variables, images)
    jax.block_until_ready(out)
    reps = 1 if on_cpu else 4
    t0 = time.perf_counter()
    for _ in range(reps):
        # feed each rep's (epsilon-perturbed) output back in: every call has
        # fresh args, so no replay layer can skip it
        out = infer_k(variables, out)
    jax.block_until_ready(out)
    infer_ips = infer_batch * K_INF * reps / (time.perf_counter() - t0)

    if np.isfinite(flops_per_step):
        v100_ips = V100_FP32_PEAK * V100_MFU / (flops_per_step / batch_size)
        vs_baseline = ips / (TARGET_MULTIPLE * v100_ips)
    else:
        vs_baseline = float("nan")

    return {
        "metric": "kd_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "device_step_images_per_sec":
        round(device_ips, 2) if device_ips is not None else None,
        "infer_images_per_sec": round(infer_ips, 2),
        "platform": platform,
        "batch_size": batch_size,
        "input_res": input_res,
        # what a SHORT run of this exact program sustains once compile is
        # included (VERDICT r4 weak #5: steady-state numbers hide fixed
        # overhead — a 2,500-step suite run sustains a small fraction of the
        # steady rate; see BASELINE.md "fixed-overhead disclosure")
        "sustained_incl_compile_img_s": round(
            batch_size * (3 + n_steps) / (compile_wall_s + dt), 2),
        "compile_wall_s": round(compile_wall_s, 1),
        "teacher_bn_folded": fold_bn,
        "pallas": bool(pallas_tpu_ok()),
        "pallas_vs_jax_rel_diff": pallas_diff,
        "step_tflops": round(flops_per_step / 1e12, 3)
        if np.isfinite(flops_per_step) else None,
    }


def main(allow_reexec: bool = False):
    jax, platform = _init_platform()

    def degrade(note: str) -> bool:
        """Move this run onto CPU after a TPU-side failure; True on success."""
        print(f"[bench] {note}", file=sys.stderr, flush=True)
        if _to_cpu_inprocess(jax):
            os.environ["KD6D_BENCH_NOTE"] = note
            return True
        if allow_reexec:
            _reexec_cpu(note)  # never returns
        return False

    if platform != "cpu" and not _probe_first_device_op(jax):
        if not degrade("TPU claim unavailable at bench time (first device op "
                       "kept failing for the whole wait window)"):
            raise RuntimeError("TPU claim unavailable and CPU fallback "
                               "could not be initialized in-process")
        platform = "cpu"

    try:
        result = _measure(jax, platform)
    except Exception as e:  # noqa: BLE001 — mid-run device failures
        if platform == "cpu":
            raise
        import traceback
        traceback.print_exc()
        if not degrade(f"TPU measurement failed mid-run "
                       f"({type(e).__name__}: {e})"):
            raise
        result = _measure(jax, "cpu")
        result["platform"] = "cpu"

    note = os.environ.get("KD6D_BENCH_NOTE")
    if note:
        result["note"] = ("degraded to CPU fallback: " + note +
                          " — value is the single-core CPU rate, see "
                          "last_chip_capture for real hardware numbers")

    last_chip = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "results", "bench_last_chip.json")
    if result["platform"] != "cpu":
        # self-maintained record of the most recent on-chip measurement, so
        # a CPU-fallback run during a relay outage can still point at the
        # round's real hardware numbers; implausible captures are quarantined
        try:
            path, payload = record_chip_capture(result, last_chip)
            if "anomaly_note" in payload:
                result["anomaly_note"] = payload["anomaly_note"]
        except OSError:
            pass
    else:
        # degraded run: the value above is single-core CPU throughput, not a
        # chip measurement — attach the last real-hardware capture alongside
        try:
            with open(last_chip) as f:
                result["last_chip_capture"] = json.load(f)
            result.setdefault(
                "note",
                "TPU unavailable at bench time; value is the CPU-fallback "
                "rate — see last_chip_capture for the most recent on-chip "
                "measurement")
        except (OSError, ValueError):
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main(allow_reexec=True)
