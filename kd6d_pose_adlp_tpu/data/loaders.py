"""Unified data access for the drivers: BOP-on-disk or procedural synthetic.

`build(cfg, kind)` returns a DataBundle with the same interface either way,
so train_kd.py / test.py are data-source agnostic.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Iterable, List, Optional

import numpy as np

from ..config import Config
from .batch import Batch, TaskConsts


@dataclasses.dataclass
class DataBundle:
    consts: TaskConsts
    meshes: List[np.ndarray]          # per-class vertex arrays (for ADD/ADI)
    train_iter: Callable[[], Iterable[Batch]]
    eval_batches: Callable[[], Iterable]  # yields (Batch, metas)
    cfg: Optional[Config] = None      # source-adjusted config (synthetic diameters)


def build(cfg: Config, kind: str = "bop", eval_limit: Optional[int] = None) -> DataBundle:
    if kind == "synthetic":
        return _build_synthetic(cfg, eval_limit or 64)
    return _build_bop(cfg, eval_limit)


def _process_shard(shard) -> Optional[tuple]:
    """(rank, count) for multi-host data sharding — the reference's
    DistributedSampler split (libs/distributed.py:109-151). `shard` wins when
    given explicitly (tests); otherwise taken from jax.distributed process
    info; None (no slicing) in the common single-process case."""
    if shard is not None:
        return shard
    import jax
    if jax.process_count() > 1:
        return (jax.process_index(), jax.process_count())
    return None


def _build_synthetic(cfg: Config, eval_n: int) -> DataBundle:
    from .synthetic import SyntheticPoseDataset
    # mixed-class scenes: every class appears, like a multi-class BOP split
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=None,
                              seed=cfg.solver.seed)
    consts = ds.consts()
    meshes = [np.asarray(consts.kp3d[c]) for c in range(cfg.data.n_fg)]
    bs = cfg.solver.ims_per_batch
    # use the synthetic box diameters, not the LINEMOD ones from the yaml
    cfg_d = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, mesh_diameters=tuple(np.asarray(consts.diameters))))

    def train_iter(shard=None):
        sh = _process_shard(shard)
        rank, count = sh if sh is not None else (0, 1)
        for step in itertools.count():
            # disjoint per-process index windows (multi-host DP): global
            # stream position = step * count + rank
            g = step * count + rank
            yield ds.batch(range(1000 + g * bs, 1000 + (g + 1) * bs), train=True)

    def eval_batches(shard=None):
        from .pipeline import collate
        tb = cfg.test.ims_per_batch
        all_idx = list(range(eval_n))
        sh = _process_shard(shard)
        if sh is not None:
            all_idx = all_idx[sh[0]::sh[1]]  # disjoint per-process shard
        for start in range(0, len(all_idx), tb):
            idx = all_idx[start:start + tb]
            while len(idx) < tb:  # static shapes: pad by wrapping
                idx += all_idx[:tb - len(idx)]
            samples = [ds.sample(i, train=False) for i in idx]
            batch = collate(samples)
            metas = [dict(filename=f"synthetic_{i:06d}.png",
                          K=s["meta"]["K"], width=s["meta"]["width"],
                          height=s["meta"]["height"],
                          class_ids=[s["meta"]["cls"]],
                          rotations=[s["meta"]["R"]],
                          translations=[s["meta"]["T"]])
                     for i, s in zip(idx, samples)]
            yield batch, metas

    return DataBundle(consts=consts, meshes=meshes, train_iter=train_iter,
                      eval_batches=eval_batches, cfg=cfg_d)


def _build_bop(cfg: Config, eval_limit: Optional[int]) -> DataBundle:
    from .pipeline import BOPPoseDataset, PrefetchLoader, collate
    train_ds = BOPPoseDataset(cfg, cfg.data.train_list, train=True)
    valid_ds = BOPPoseDataset(cfg, cfg.data.valid_list or cfg.data.test_list,
                              train=False)
    consts = train_ds.consts()
    meshes = train_ds.meshes

    def train_iter(num_threads: int = 2, shard=None):
        loader = PrefetchLoader(train_ds, cfg.solver.ims_per_batch, train=True,
                                num_threads=num_threads, seed=cfg.solver.seed,
                                shard=_process_shard(shard))
        for batch, _ in loader:
            yield batch

    def eval_batches(shard=None):
        # one eval sample per (image, object) — reference dzi_test_mobj
        items = valid_ds.eval_items()
        if eval_limit is not None:
            items = items[:eval_limit]
        sh = _process_shard(shard)
        if sh is not None:
            items = items[sh[0]::sh[1]]  # disjoint per-process eval shard;
            # evaluator.valid all-gathers the prediction dicts before scoring
        tb = cfg.test.ims_per_batch
        for start in range(0, len(items), tb):
            chunk = items[start:start + tb]
            samples = []
            for img_i, obj_j in chunk:
                s = valid_ds.sample(img_i, seed=0, focus_obj=obj_j)
                if s is not None:
                    samples.append(s)
            if not samples:
                continue
            while len(samples) < tb:  # static shapes: pad with a duplicate
                samples.append(samples[-1])
            yield collate(samples), [s["meta"] for s in samples]

    return DataBundle(consts=consts, meshes=meshes,
                      train_iter=train_iter, eval_batches=eval_batches)
