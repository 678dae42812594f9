"""Distillation / baseline training driver (CLI).

TPU-native equivalent of the reference `train_kd.py` + `arguments/argument_kd.py`:
one command trains the student with (kd_weight > 0) or without (kd_weight 0)
a teacher, mirroring every reference flag. `--data synthetic` runs on the
built-in procedural scenes (the only data available in this image);
`--data bop` reads a BOP-format dataset from the YAML paths.

Examples (reference train.sh):
  python train_kd.py --config_file configs/ape.yaml --backbone darknet_tiny_h \
      --kd_weight 0 --max_iters 10000 --working_dir outputs/baseline/
  python train_kd.py --config_file configs/ape.yaml --backbone darknet_tiny_h \
      --backbone_t darknet53 --weight_file_t outputs/teacher/final.ckpt \
      --kd_weight 5 --max_iters 10000 --working_dir outputs/kd/
"""
from __future__ import annotations

import argparse
import dataclasses
import os


def str2bool(v):
    return str(v).lower() in ("yes", "true", "t", "1")


def get_argparser():
    p = argparse.ArgumentParser()
    # base flags (reference arguments/argument.py:6-22)
    p.add_argument("--config_file", type=str, default="./configs/ape.yaml")
    p.add_argument("--working_dir", type=str, default="./outputs/")
    p.add_argument("--weight_file", type=str, default="")
    p.add_argument("--backbone", type=str, default="darknet_tiny_h")
    p.add_argument("--max_iters", type=int, default=20000)
    p.add_argument("--base_lr", type=float, default=0.001)
    p.add_argument("--num_workers", type=int, default=4)
    # teacher flags (reference arguments/argument_kd.py:32-35)
    p.add_argument("--config_file_t", type=str, default="")
    p.add_argument("--backbone_t", type=str, default="darknet53")
    p.add_argument("--weight_file_t", type=str, default="")
    # KD flags (reference arguments/argument_kd.py:37-49)
    p.add_argument("--kd_weight", type=float, default=5.0)
    p.add_argument("--kd_level", type=str, default="pred")
    p.add_argument("--gtype", type=str, default="sinkhorn",
                   choices=["l1", "l2", "sinkhorn", "gaussian", "laplacian", "energy"])
    p.add_argument("--glevel", type=str, default="point", choices=["point"])
    p.add_argument("--p", type=float, default=2.0)
    p.add_argument("--blur", type=float, default=0.001)
    p.add_argument("--gnD", type=int, default=2)
    p.add_argument("--weightedOT", type=str2bool, nargs="?", const=True, default=True)
    p.add_argument("--wot_detach", type=str2bool, nargs="?", const=True, default=False)
    p.add_argument("--scaling", type=float, default=0.5)
    p.add_argument("--reach", type=float, default=0.5)
    p.add_argument("--kd_teacher_class", type=str, default="gt",
                   choices=["gt", "pred"],
                   help="teacher voted class: gt = image's GT label "
                        "(single-object LINEMOD shortcut), pred = teacher's "
                        "best-scoring candidate label (reference "
                        "postprocess_kd semantics; required for multi-class)")
    # TPU-framework extras
    p.add_argument("--data", type=str, default="bop", choices=["bop", "synthetic"])
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fast_pipeline", action="store_true",
                   help="single-warp host data path: compose the internal "
                        "and DZI affines into one raw->crop warp, augment "
                        "the 256 crop (~3x less host pixel work/sample)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the student forward in the backward "
                        "pass (identical gradients, ~no stored activations; "
                        "for batch sizes past the HBM ceiling)")
    p.add_argument("--n_devices", type=int, default=0, help="0 = all")
    p.add_argument("--device_pool", type=int, default=0,
                   help="synthetic only: pre-render N batches, pin them on "
                        "device, and scan --steps_per_dispatch steps per "
                        "host dispatch (amortizes dispatch RTT ~2.4x on the "
                        "remote-tunnel TPU; cycles like itertools.cycle)")
    p.add_argument("--steps_per_dispatch", type=int, default=50)
    p.add_argument("--cache_teacher", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="with --device_pool + distillation: precompute the "
                        "frozen teacher's voted pool knowledge ONCE (~70%% "
                        "of KD-step FLOPs; exact for a static pool)")
    p.add_argument("--vis_every", type=int, default=1000,
                   help="KD cloud scatter dump cadence (0 = off)")
    p.add_argument("--backbone_init", type=str, default="",
                   help="final.ckpt to initialize the student backbone from "
                        "(pretrained init, reference libs/train_libs.py:82-87)")
    p.add_argument("--fold_teacher_bn", type=str2bool, nargs="?", const=True,
                   default=True,
                   help="fold the frozen teacher's BN into its conv weights")
    p.add_argument("--quant_teacher", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="int8-quantize the frozen teacher (PTQ, utils/quant): "
                        "per-channel int8 weights + calibrated activation "
                        "scales; the v5e MXU runs int8 at 2x the bf16 peak. "
                        "Requires --fold_teacher_bn. The teacher sanity eval "
                        "then scores the QUANTIZED teacher — check it there")
    p.add_argument("--quant_calib_batches", type=int, default=4,
                   help="eval batches used to calibrate teacher activation "
                        "ranges for --quant_teacher")
    p.add_argument("--eval_mode", type=str, default="scan",
                   choices=["scan", "stream"],
                   help="scan = one-dispatch evaluator with device metrics "
                        "(engine/eval_scan; eval set stays device-resident "
                        "across VAL_FREQ evals); stream = per-batch "
                        "evaluator.valid (the oracle path)")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (also via KD6D_CPU=1). The "
                        "axon sitecustomize registers the TPU at interpreter "
                        "start and ignores JAX_PLATFORMS=cpu; this sets "
                        "jax_platforms before any device use — required for "
                        "CPU smokes, and for ANY run while another process "
                        "holds the single TPU claim")
    return p


def build_configs(args):
    from kd6d_pose_adlp_tpu.config import Config, KDConfig, load_yaml_config

    kd = KDConfig(weight=args.kd_weight, level=args.kd_level, gtype=args.gtype,
                  glevel=args.glevel, p=args.p, blur=args.blur, gn_d=args.gnD,
                  weighted_ot=args.weightedOT, wot_detach=args.wot_detach,
                  scaling=args.scaling, reach=args.reach,
                  teacher_class=args.kd_teacher_class)
    cfg = load_yaml_config(args.config_file, backbone=args.backbone)
    cfg = cfg.replace(kd=kd, working_dir=args.working_dir)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype=args.compute_dtype,
                                  remat=args.remat),
        solver=dataclasses.replace(cfg.solver, max_iter=args.max_iters,
                                   base_lr=args.base_lr),
        data=dataclasses.replace(cfg.data, fast_pipeline=args.fast_pipeline))
    cfg_t = load_yaml_config(args.config_file_t or args.config_file,
                             backbone=args.backbone_t)
    cfg_t = cfg_t.replace(kd=kd, model=dataclasses.replace(
        cfg_t.model, compute_dtype=args.compute_dtype))
    return cfg, cfg_t


def main():
    args = get_argparser().parse_args()
    import jax
    if args.cpu or os.environ.get("KD6D_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        # multi-host SPMD: one process per host; eval predictions are merged
        # via parallel.mesh.gather_host_objects inside evaluator.valid
        jax.distributed.initialize()
    import jax.numpy as jnp

    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()

    from kd6d_pose_adlp_tpu.data import loaders
    from kd6d_pose_adlp_tpu.engine import evaluator
    from kd6d_pose_adlp_tpu.engine.loop import train
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
    from kd6d_pose_adlp_tpu.engine.steps import build_forward
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.parallel.mesh import make_mesh
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose

    cfg, cfg_t = build_configs(args)
    # distillation needs a positive weight and a teacher; synthetic mode
    # allows an untrained (random) teacher for pipeline exercises
    distill = args.kd_weight > 0.0 and (
        args.weight_file_t != "" or args.data == "synthetic")

    data = loaders.build(cfg, kind=args.data)
    if data.cfg is not None:
        cfg = data.cfg  # synthetic mesh diameters replace the yaml's LINEMOD ones
    consts = data.consts
    mesh = make_mesh(args.n_devices or None)
    n_dev = len(mesh.devices.flatten())
    print(f"devices: {n_dev} x {jax.devices()[0].device_kind}")

    teacher_variables = None
    if distill:
        teacher_net = PoseNet(cfg=cfg_t.model, n_fg=cfg.data.n_fg)
        t_init = teacher_net.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, cfg_t.model.input_res, cfg_t.model.input_res, 3)))
        if args.weight_file_t:
            t_init, n = load_params_loose(args.weight_file_t, t_init)
            print(f"teacher: loaded {n} tensors from {args.weight_file_t}")
        teacher_variables = t_init
        if args.weight_file_t and args.fold_teacher_bn:
            # frozen eval-mode teacher: BN is a constant affine — fold it
            # into the conv weights once (utils/fold_bn) and rebuild the
            # teacher as the fused-conv model
            from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
            teacher_variables = fold_batchnorm(teacher_variables)
            cfg_t = cfg_t.replace(model=dataclasses.replace(
                cfg_t.model, bn_folded=True))
            teacher_net = PoseNet(cfg=cfg_t.model, n_fg=cfg.data.n_fg)
            print("teacher: BN folded into conv weights")
        if args.weight_file_t and args.quant_teacher:
            if not args.fold_teacher_bn:
                raise SystemExit("--quant_teacher requires --fold_teacher_bn")
            # int8 PTQ of the frozen teacher: calibrate activation ranges on
            # a few eval batches (same crop/normalization distribution as
            # train, no loader threads to manage), then rebuild the teacher
            # as the quant_mode="quant" model (utils/quant)
            from kd6d_pose_adlp_tpu.utils.quant import quantize_posenet
            calib = []
            for b, _ in data.eval_batches():
                calib.append(b.images)
                if len(calib) >= args.quant_calib_batches:
                    break
            teacher_net, teacher_variables = quantize_posenet(
                cfg_t.model, cfg.data.n_fg, teacher_variables, calib)
            cfg_t = cfg_t.replace(model=dataclasses.replace(
                cfg_t.model, quant_mode="quant"))
            print(f"teacher: int8-quantized ({len(calib)} calib batches)")

    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    forward = build_forward(cfg, net)
    postprocess = build_postprocess(cfg, consts)

    # model-size comparison (reference train_kd.py:76-78)
    count = lambda tree: sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
    s_params = net.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, cfg.model.input_res, cfg.model.input_res, 3)))["params"]
    if teacher_variables is not None:
        print(f"Model size: Student VS Teacher: {count(s_params):d} vs "
              f"{count(teacher_variables['params']):d}")
    else:
        print(f"Model size: {count(s_params):d} params")
    del s_params

    scan_eval = None
    if args.eval_mode == "scan":
        # one-dispatch evaluator (engine/eval_scan): the eval set is staged
        # on device ONCE and reused by every VAL_FREQ eval and the teacher
        # sanity gate — the streaming path re-builds and re-uploads it per
        # call (~13 s of host pipeline per eval on this 1-core host)
        from kd6d_pose_adlp_tpu.engine.eval_scan import ScanEvaluator
        scan_eval = ScanEvaluator(cfg, consts, net, data.meshes)
        scan_eval.prepare(data.eval_batches())

    if distill and args.weight_file_t:
        # teacher sanity gate (reference train_kd.py:85-86)
        print("--- evaluate teacher ---")
        if scan_eval is not None:
            from kd6d_pose_adlp_tpu.engine.eval_scan import ScanEvaluator
            t_sev = ScanEvaluator(
                dataclasses.replace(cfg_t, test=cfg.test, data=cfg.data),
                consts, teacher_net, data.meshes)
            t_sev.share_staged(scan_eval)
            t_sev.run(teacher_variables, step=0, working_dir=args.working_dir)
        else:
            t_forward = build_forward(cfg_t, teacher_net)
            t_post = build_postprocess(cfg_t.replace(test=cfg.test), consts)
            evaluator.valid(cfg, consts, teacher_variables, t_forward, t_post,
                            data.eval_batches(), data.meshes, step=0,
                            working_dir=args.working_dir)

    from kd6d_pose_adlp_tpu.utils.logging_utils import ScalarLogger
    eval_logger = ScalarLogger(args.working_dir, filename="eval_scalars.jsonl")

    def eval_fn(state, step):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if scan_eval is not None:
            scan_eval.run(variables, step=step, working_dir=args.working_dir,
                          logger=eval_logger)
        else:
            evaluator.valid(cfg, consts, variables, forward, postprocess,
                            data.eval_batches(), data.meshes, step=step,
                            working_dir=args.working_dir, logger=eval_logger)

    pool, train_iter = None, None
    if args.device_pool > 0:
        # device-resident pool + multi-step scan (engine/loop.py pool path).
        # Synthetic only: a static pool would freeze the BOP pipeline's
        # per-epoch DZI re-crops/augmentations (reference getitem_dzi).
        if args.data != "synthetic":
            raise SystemExit("--device_pool requires --data synthetic")
        import numpy as np
        it = data.train_iter()
        host = [next(it) for _ in range(args.device_pool)]
        pool = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *host)
        print(f"device pool: {args.device_pool} batches x "
              f"{host[0].images.shape[0]} images", flush=True)
    else:
        train_iter = (data.train_iter(args.num_workers)
                      if args.data == "bop" else data.train_iter())

    train(cfg, consts, train_iter,
          cfg_t=cfg_t, teacher_variables=teacher_variables,
          eval_fn=eval_fn, working_dir=args.working_dir, mesh=mesh,
          pool=pool, steps_per_dispatch=args.steps_per_dispatch,
          cache_teacher=args.cache_teacher,
          backbone_init=args.backbone_init or None,
          vis_every=args.vis_every)


if __name__ == "__main__":
    main()
