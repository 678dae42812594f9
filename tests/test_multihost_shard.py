"""Multi-host data sharding: the DistributedSampler equivalent.

The reference splits every epoch's index order across ranks
(libs/distributed.py:109-151 DistributedSampler); here PrefetchLoader's
`shard=(rank, count)` and the loaders' `shard=` argument take strided
slices of the SAME epoch permutation, so the union over ranks is exactly
one epoch and evaluator.valid's all-gather merge sees each item once."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from kd6d_pose_adlp_tpu.data import loaders
from kd6d_pose_adlp_tpu.data.pipeline import BOPPoseDataset, PrefetchLoader

from test_data_pipeline import bop_root, _cfg  # noqa: F401 (fixture reuse)


def _epoch_filenames(ds, shard, train):
    loader = PrefetchLoader(ds, batch_size=2, train=train, num_threads=1,
                            seed=3, shard=shard)
    names = []
    it = iter(loader)
    n_batches = 1  # each shard holds 2 of the 4 images -> one bs-2 batch
    for _ in range(n_batches):
        _, metas = next(it)
        names += [m["filename"] for m in metas]
    del it
    return names


@pytest.mark.parametrize("train", [False, True])
def test_prefetch_loader_shards_are_disjoint_epochs(bop_root, train):  # noqa: F811
    cfg = _cfg(bop_root)
    ds = BOPPoseDataset(cfg, cfg.data.train_list, train=train)
    a = _epoch_filenames(ds, (0, 2), train)
    b = _epoch_filenames(ds, (1, 2), train)
    assert not (set(a) & set(b))               # disjoint shards
    assert set(a) | set(b) == set(ds.images)   # union = exactly one epoch


def test_prefetch_loader_shard_validation(bop_root):  # noqa: F811
    cfg = _cfg(bop_root)
    ds = BOPPoseDataset(cfg, cfg.data.train_list, train=False)
    with pytest.raises(AssertionError):
        PrefetchLoader(ds, batch_size=2, shard=(2, 2))


def test_synthetic_eval_batches_sharded():
    from kd6d_pose_adlp_tpu.config import Config, ModelConfig, SolverConfig
    cfg = Config(model=ModelConfig(input_res=128),
                 solver=SolverConfig(max_objs=2))
    bundle = loaders.build(cfg, "synthetic", eval_limit=8)

    def names(shard):
        out = []
        for _, metas in bundle.eval_batches(shard=shard):
            out += [m["filename"] for m in metas]
        return out

    full = set(names(None))
    a, b = names((0, 2)), names((1, 2))
    # padding may duplicate within a shard; coverage must still be exact
    assert set(a) | set(b) == full
    assert not (set(a) & set(b))
