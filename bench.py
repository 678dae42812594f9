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

Fail-soft policy (VERDICT round 1): a benchmark must degrade, never die.
If the TPU claim is unavailable the run falls back to CPU and says so in
the JSON; if the Pallas kernel cannot lower/execute, the KD loss's probe
routes to the pure-JAX Sinkhorn automatically.
"""
from __future__ import annotations

import json
import time

V100_FP32_PEAK = 15.7e12
V100_MFU = 0.5
TARGET_MULTIPLE = 5.0


def _tunnel_up(port: int = 8082, timeout_s: float = 3.0) -> bool:
    """TCP-probe the axon relay's first loopback port. When the relay is
    DOWN, jax device init does not raise — it BLOCKS forever (observed
    2026-08-17 outage, CLAUDE.md), so fail-soft needs this pre-check."""
    import os
    import socket
    if not os.path.exists(os.path.expanduser("~/.tpu_init.py")):
        return True  # no axon relay in this image: nothing to probe
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout_s):
            return True
    except OSError:
        return False


def _init_platform():
    """Initialize a backend; fall back to CPU if the TPU claim is unavailable
    (single-process chip with minutes-long claim release, see CLAUDE.md)."""
    import os
    import sys
    import time

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
        import sys
        print(f"[bench] device init failed ({type(e).__name__}: {e}); "
              f"falling back to CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return jax, jax.devices()[0].platform


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


def main():
    jax, platform = _init_platform()
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

    import os
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
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)

    step_fn = jax.jit(build_train_step(cfg, cfg_t, consts, net, teacher_net,
                                       opt, distill=True), donate_argnums=(0,))

    # FLOP count of the compiled step for the V100-derived baseline; the AOT
    # lowering shares the jit cache, so this is the only compilation
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

    result = {
        "metric": "kd_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "device_step_images_per_sec":
        round(device_ips, 2) if device_ips is not None else None,
        "infer_images_per_sec": round(infer_ips, 2),
        "platform": platform,
        "teacher_bn_folded": fold_bn,
        "pallas": bool(pallas_tpu_ok()),
        "pallas_vs_jax_rel_diff": pallas_diff,
        "step_tflops": round(flops_per_step / 1e12, 3)
        if np.isfinite(flops_per_step) else None,
    }
    last_chip = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "results", "bench_last_chip.json")
    if not on_cpu:
        # self-maintained record of the most recent on-chip measurement, so
        # a CPU-fallback run during a relay outage can still point at the
        # round's real hardware numbers
        try:
            os.makedirs(os.path.dirname(last_chip), exist_ok=True)
            with open(last_chip, "w") as f:
                json.dump(dict(result, captured_at=time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())), f)
        except OSError:
            pass
    else:
        # degraded run: the value above is single-core CPU throughput, not a
        # chip measurement — attach the last real-hardware capture alongside
        try:
            with open(last_chip) as f:
                result["last_chip_capture"] = json.load(f)
            result["note"] = ("axon relay down at bench time; value is the "
                              "CPU-fallback rate — see last_chip_capture for "
                              "the most recent on-chip measurement")
        except (OSError, ValueError):
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
