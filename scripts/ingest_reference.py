"""One-command reference-checkpoint ingestion (VERDICT r4 next #6).

The day real LINEMOD data + a reference-trained `final.pth` land, this is
the one-liner that produces the parity table:

    python scripts/ingest_reference.py \
        --weight_file /path/to/final.pth \
        --config_file /path/to/ape.yaml \
        [--backbone darknet_tiny_h] [--out outputs/ingest/] [--cpu]

Steps:
  1. load the reference-format torch state dict
     (reference test.py:94-137 loads {'model': state_dict};
     backbone/model_store.py:530-774 is the pretrained-weight store)
  2. convert to this framework's Flax trees (utils/torch_convert
     convert_pose_module — numerically parity-tested against the live
     reference modules in tests/test_full_model_parity.py)
  3. save as <out>/converted.ckpt
  4. evaluate through test.py on the YAML's test split (BOP layout) and
     print the per-class ADD/ADI/AUC/REP table

Rehearsed in CI on fabricated artifacts (tests/test_ingest_reference.py:
make_bop_dataset tree + random-init reference modules), so the path stays
drill-ready under zero egress.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def convert(weight_file: str, config_file: str, backbone: str,
            out_path: str, compute_dtype: str = "float32") -> str:
    """Reference .pth -> Flax ckpt at out_path; returns the ckpt path."""
    import jax
    import jax.numpy as jnp

    from kd6d_pose_adlp_tpu.config import load_yaml_config
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import save_params
    from kd6d_pose_adlp_tpu.utils.torch_convert import (
        convert_pose_module, load_torch_state_dict, merge_into_variables)

    cfg = load_yaml_config(config_file, backbone=backbone)
    sd = load_torch_state_dict(weight_file)
    # strip torch DDP prefixes (reference train_kd.py wraps in
    # DistributedDataParallel; its checkpoints may carry 'module.')
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    params, stats = convert_pose_module(sd)

    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, cfg.model.input_res, cfg.model.input_res, 3)))
    n_before = len(jax.tree_util.tree_leaves(variables))
    variables = merge_into_variables(variables, params, stats)
    n_conv = (len(jax.tree_util.tree_leaves(params))
              + len(jax.tree_util.tree_leaves(stats)))
    print(f"converted {n_conv} reference tensors into a "
          f"{n_before}-leaf {backbone} PoseNet", flush=True)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    save_params(out_path, variables)
    print(f"wrote {out_path}", flush=True)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weight_file", type=str, required=True,
                    help="reference-format final.pth / latest.pth")
    ap.add_argument("--config_file", type=str, default="./configs/ape.yaml",
                    help="reference-schema YAML whose DATASETS paths point "
                         "at the LINEMOD/BOP-layout tree")
    ap.add_argument("--backbone", type=str, default="darknet_tiny_h")
    ap.add_argument("--out", type=str, default="outputs/ingest/")
    ap.add_argument("--eval_mode", type=str, default="scan",
                    choices=["scan", "stream"])
    ap.add_argument("--ims_per_batch", type=int, default=24)
    ap.add_argument("--compute_dtype", type=str, default="bfloat16")
    ap.add_argument("--convert_only", action="store_true",
                    help="stop after writing converted.ckpt")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu or os.environ.get("KD6D_CPU") == "1":
        os.environ["KD6D_CPU"] = "1"
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.compute_dtype = "float32"

    ckpt = convert(args.weight_file, args.config_file, args.backbone,
                   os.path.join(args.out, "converted.ckpt"))
    if args.convert_only:
        return

    import test as test_cli
    sys.argv = ["test.py", "--weight_file", ckpt,
                "--config_file", args.config_file,
                "--backbone", args.backbone, "--data", "bop",
                "--working_dir", args.out,
                "--eval_mode", args.eval_mode,
                "--ims_per_batch", str(args.ims_per_batch),
                "--compute_dtype", args.compute_dtype] \
               + (["--cpu"] if args.cpu else [])
    test_cli.main()


if __name__ == "__main__":
    main()
