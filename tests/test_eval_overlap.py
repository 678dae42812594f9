"""Double-buffered eval must be a pure scheduling change.

evaluator.valid(overlap=True) dispatches batch i+1's forward+postprocess
before blocking on batch i's device_get (BASELINE.md "Eval loop overlap":
1.30x end-to-end on chip). Predictions and metrics must be IDENTICAL to
the serial order — only dispatch timing may differ. Reference hot loop:
libs/eval_libs.py:59-95 (strictly serial there).
"""
import dataclasses

import numpy as np
import pytest

from kd6d_pose_adlp_tpu.engine import evaluator
from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess

from test_train_e2e import (N_FG, _fabricated_outputs, _tiny_consts,
                            small_cfg, small_data)


@pytest.mark.slow
def test_eval_overlap_matches_serial():
    cfg = small_cfg()
    ds = small_data()
    consts = _tiny_consts(ds)
    postprocess = build_postprocess(cfg, consts)
    cfg_eval = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, n_class=N_FG + 1,
        mesh_diameters=tuple(np.asarray(consts.diameters))))
    meshes = [np.asarray(consts.kp3d[c]) for c in range(N_FG)]

    batches = []
    for start in range(0, 12, 4):
        idx = list(range(start, start + 4))
        batch = ds.batch(idx, train=False)
        metas = []
        for i in idx:
            s = ds.sample(i, train=False)
            metas.append(dict(filename=f"img_{i}.png", K=s["meta"]["K"],
                              width=s["meta"]["width"],
                              height=s["meta"]["height"],
                              class_ids=[s["meta"]["cls"]],
                              rotations=[s["meta"]["R"]],
                              translations=[s["meta"]["T"]]))
        batches.append((batch, metas))
    outs = [_fabricated_outputs(b, consts, cfg) for b, _ in batches]

    def run(overlap, stage=True):
        it = iter(outs)

        def forward(variables, images):
            return next(it)

        # a lazy generator (not a list) so the staging worker actually
        # exercises the pull-from-iterator path
        def gen():
            yield from batches

        return evaluator.valid(cfg_eval, consts, None, forward, postprocess,
                               gen(), meshes, verbose=False,
                               overlap=overlap, stage=stage)

    r_serial = run(False, stage=False)
    for overlap, stage in ((True, True), (True, False), (False, True)):
        r = run(overlap, stage)
        assert r["predictions"] == r_serial["predictions"], (overlap, stage)
        assert r["table"] == r_serial["table"], (overlap, stage)
    r_overlap = run(True)
    # and the pipeline actually scored something (not a vacuous pass)
    adi = [r_serial["adi_per_class"][1].get("ADI.10d")]
    assert adi[0] is not None and adi[0] > 0.0, r_serial["table"]
