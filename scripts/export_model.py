"""Export a trained checkpoint as a serving artifact (StableHLO, jax.export).

Builds the same Config/consts the training drivers use, loads the
checkpoint loosely (utils.checkpoint.load_params_loose), bakes everything
into one portable inference endpoint via engine.serving.export_inference,
and (with --check) round-trips the artifact through load_serving to verify
the deserialized program reproduces the in-process model bit-for-bit.

Examples:
  python scripts/export_model.py --weight_file outputs/ab/teacher30k/final.ckpt \
      --backbone darknet53 --batch_size 8 --out outputs/serving/teacher_bs8.hlo
  python scripts/export_model.py --cpu --check ...   # during a TPU outage
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weight_file", type=str, required=True)
    ap.add_argument("--backbone", type=str, default="darknet_tiny_h")
    ap.add_argument("--input_res", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=1,
                    help="0 = symbolic batch (one artifact, any batch size)")
    ap.add_argument("--mode", choices=["single", "multi", "frame"],
                    default="single",
                    help="'frame' bakes the raw-frame->crop warp into the "
                         "artifact (zero host image ops at serving time); "
                         "requires --frame_hw")
    ap.add_argument("--frame_hw", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="raw camera frame size for --mode frame")
    ap.add_argument("--data", choices=["synthetic", "bop"], default="synthetic",
                    help="task-constant source (camera K, 3D keypoints)")
    ap.add_argument("--config_file", type=str, default="",
                    help="YAML config (required for --data bop)")
    ap.add_argument("--platforms", type=str, default="cpu,tpu")
    ap.add_argument("--out", type=str, default="outputs/serving/model.hlo")
    ap.add_argument("--check", action="store_true",
                    help="round-trip the artifact and compare outputs")
    ap.add_argument("--fold_bn", action="store_true",
                    help="fold BatchNorm into conv weights before export "
                         "(utils.fold_bn): strictly fewer ops per inference "
                         "and no BN stats in the artifact")
    ap.add_argument("--quant", action="store_true",
                    help="int8 post-training quantization (utils.quant, "
                         "requires --fold_bn): per-channel int8 conv weights "
                         "+ calibrated activation scales baked into the "
                         "artifact; v5e MXU int8 peak is 2x bf16. Accuracy "
                         "cost measured at ~0 ADI (scripts/bench_quant.py)")
    ap.add_argument("--quant_calib_batches", type=int, default=4,
                    help="eval batches for --quant activation calibration")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu or os.environ.get("KD6D_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig, load_yaml_config
    from kd6d_pose_adlp_tpu.data import loaders
    from kd6d_pose_adlp_tpu.engine.serving import (build_infer_fn,
                                                   centered_bbox_trans,
                                                   export_inference,
                                                   load_serving)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose

    dtype = "float32" if (args.cpu or os.environ.get("KD6D_CPU")) \
        else "bfloat16"
    if args.config_file:
        cfg = load_yaml_config(args.config_file)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, backbone=args.backbone, input_res=args.input_res,
            compute_dtype=dtype))
    else:
        cfg = Config(model=ModelConfig(backbone=args.backbone,
                                       input_res=args.input_res,
                                       compute_dtype=dtype))
    bundle = loaders.build(
        cfg, args.data,
        eval_limit=(args.quant_calib_batches * cfg.test.ims_per_batch
                    if args.quant else 1))
    cfg = bundle.cfg or cfg
    consts = bundle.consts

    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    init = net.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, args.input_res, args.input_res, 3)))
    variables, n = load_params_loose(args.weight_file, init)
    print(f"loaded {n} tensors from {args.weight_file}", flush=True)

    if args.fold_bn:
        from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
        folded = fold_batchnorm(variables)
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, bn_folded=True))
        net_f = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
        # sanity: the folded network reproduces the frozen-BN logits
        x = jnp.asarray(np.random.default_rng(1).integers(
            0, 256, (1, args.input_res, args.input_res, 3), dtype=np.uint8))
        ref_cls = jax.jit(lambda v, x: net.apply(v, x, train=False))(
            variables, x)
        got_cls = jax.jit(lambda v, x: net_f.apply(v, x, train=False))(
            folded, x)
        tol = 1e-3 if cfg.model.compute_dtype == "float32" else 1e-1
        err = float(jnp.max(jnp.abs(jnp.concatenate(
            [a.reshape(-1) - b.reshape(-1)
             for a, b in zip(jax.tree_util.tree_leaves(ref_cls),
                             jax.tree_util.tree_leaves(got_cls))]))))
        print(f"fold_bn: max logit delta {err:.2e} (tol {tol})", flush=True)
        assert err < tol, "BN folding changed the network beyond tolerance"
        variables = folded

    if args.quant:
        if not args.fold_bn:
            raise SystemExit("--quant requires --fold_bn")
        from kd6d_pose_adlp_tpu.utils.quant import quantize_posenet
        calib = []
        for b, _ in bundle.eval_batches():
            calib.append(b.images)
            if len(calib) >= args.quant_calib_batches:
                break
        _, variables = quantize_posenet(cfg.model, cfg.data.n_fg, variables,
                                        calib)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, quant_mode="quant"))
        print(f"int8-quantized ({len(calib)} calib batches)", flush=True)

    meta = export_inference(cfg, consts, variables, args.out,
                            batch_size=args.batch_size, mode=args.mode,
                            platforms=tuple(args.platforms.split(",")),
                            frame_hw=tuple(args.frame_hw)
                            if args.frame_hw else None)
    print(json.dumps(meta), flush=True)

    if args.check:
        check_bs = args.batch_size or 2  # symbolic artifact: check at bs 2
        rng = np.random.default_rng(0)
        ids = np.zeros((check_bs,), np.int32)
        serve, _ = load_serving(args.out)
        if args.mode == "frame":
            from kd6d_pose_adlp_tpu.engine.serving import build_frame_infer_fn
            fh, fw = args.frame_hw
            frames = rng.integers(0, 256, (check_bs, fh, fw, 3),
                                  dtype=np.uint8)
            centers = np.tile(np.asarray(
                [[cfg.data.internal_width / 2,
                  cfg.data.internal_height / 2]], np.float32), (check_bs, 1))
            scales = np.full((check_bs,), args.input_res, np.float32)
            direct = jax.jit(build_frame_infer_fn(cfg, consts, variables,
                                                  (fh, fw)))
            ref = jax.device_get(direct(
                jnp.asarray(frames), jnp.asarray(centers),
                jnp.asarray(scales), jnp.asarray(ids),
                jnp.asarray(7, jnp.uint32)))
            got = jax.device_get(serve(frames, centers, scales, ids, seed=7))
        else:
            images = rng.integers(0, 256, (check_bs, args.input_res,
                                           args.input_res, 3), dtype=np.uint8)
            bt = centered_bbox_trans(check_bs, args.input_res)
            direct = jax.jit(build_infer_fn(cfg, consts, variables,
                                            mode=args.mode))
            ref = jax.device_get(direct(jnp.asarray(images), jnp.asarray(bt),
                                        jnp.asarray(ids),
                                        jnp.asarray(7, jnp.uint32)))
            got = jax.device_get(serve(images, bt, ids, seed=7))
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]), rtol=1e-5,
                                       atol=1e-5, err_msg=k)
        print("round-trip check OK: artifact reproduces the in-process "
              "model", flush=True)


if __name__ == "__main__":
    main()
