"""KD loss gradient flow: the OT term must actually train the student."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig, SolverConfig, TestConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.losses import pose_losses, prepare_targets
from kd6d_pose_adlp_tpu.engine.steps import teacher_knowledge
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

RES, N_FG = 64, 3


def _setup():
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=RES),
                 solver=SolverConfig(max_objs=2, max_pos=32, ims_per_batch=2),
                 test=TestConfig(max_votes=16, ransac_iters=8),
                 kd=KDConfig(weight=5.0, max_teacher_cells=16))
    ds = SyntheticPoseDataset(n_fg=N_FG, input_res=RES, max_objs=2,
                              single_class=1, seed=3)
    consts = ds.consts()
    consts = consts._replace(kp3d=consts.kp3d[:N_FG],
                             diameters=consts.diameters[:N_FG])
    batch = ds.batch(range(2), train=True)
    return cfg, consts, batch


def _fake_teacher_votes(cfg, consts, batch):
    """Teacher votes fabricated from GT so votes are guaranteed non-empty."""
    from kd6d_pose_adlp_tpu.models import coder
    from kd6d_pose_adlp_tpu.ops.voting import Votes
    B = batch.images.shape[0]
    T_CELLS = cfg.kd.max_teacher_cells
    cls0 = jnp.clip(batch.class_ids[:, 0], 0)
    corners = consts.kp3d[cls0]
    kp_internal = coder.project_corners(consts.K, batch.rotations[:, 0],
                                        batch.translations[:, 0], corners)
    kp2d = jnp.broadcast_to(kp_internal[:, None], (B, T_CELLS, 8, 2))
    # small per-cell jitter so the teacher cloud is a real distribution
    jit = jax.random.normal(jax.random.PRNGKey(0), kp2d.shape) * 2.0
    return Votes(kp2d=kp2d + jit,
                 score=jnp.full((B, T_CELLS), 0.8),
                 valid=jnp.ones((B, T_CELLS), bool),
                 box_size=jnp.full((B,), 64.0))


@pytest.mark.slow
def test_kd_loss_gradients_reach_student_params():
    cfg, consts, batch = _setup()
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    variables = net.init(jax.random.PRNGKey(0), batch.images)
    votes = _fake_teacher_votes(cfg, consts, batch)
    rng = jax.random.PRNGKey(1)

    def kd_only(params):
        cls_logits, pred_reg = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch.images, train=False)
        out = pose_losses(rng, cls_logits, pred_reg, batch, consts, cfg,
                          teacher=(votes, 640.0, 480.0))
        return out.loss_kd

    val, grads = jax.value_and_grad(kd_only)(variables["params"])
    assert np.isfinite(float(val))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                               for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0, gnorm
    # the regression head must receive gradient (keypoints feed the OT);
    # with weighted OT the cls head does too (weights carry gradient)
    head = grads["head"]
    g_reg = float(jnp.abs(head["pose_pred"]["kernel"]).max())
    g_cls = float(jnp.abs(head["cls_logits"]["kernel"]).max())
    assert g_reg > 0
    assert g_cls > 0  # weighted_ot=True, wot_detach=False


def test_kd_loss_wot_detach_blocks_cls_gradient():
    cfg, consts, batch = _setup()
    cfg = cfg.replace(kd=dataclasses.replace(cfg.kd, wot_detach=True))
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    variables = net.init(jax.random.PRNGKey(0), batch.images)
    votes = _fake_teacher_votes(cfg, consts, batch)
    rng = jax.random.PRNGKey(1)

    def kd_only(params):
        cls_logits, pred_reg = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch.images, train=False)
        out = pose_losses(rng, cls_logits, pred_reg, batch, consts, cfg,
                          teacher=(votes, 640.0, 480.0))
        return out.loss_kd

    grads = jax.grad(kd_only)(variables["params"])
    # with detached weights the ONLY path to cls_logits is cut
    g_cls = float(jnp.abs(grads["head"]["cls_logits"]["kernel"]).max())
    g_reg = float(jnp.abs(grads["head"]["pose_pred"]["kernel"]).max())
    assert g_cls == 0.0
    assert g_reg > 0


def test_train_step_deterministic():
    from kd6d_pose_adlp_tpu.engine.steps import (build_train_step,
                                                 create_train_state,
                                                 make_optimizer)
    cfg, consts, batch = _setup()
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    opt = make_optimizer(cfg)
    step_fn = jax.jit(build_train_step(cfg, None, consts, net, None, opt,
                                       distill=False))
    m1 = step_fn(create_train_state(jax.random.PRNGKey(0), cfg, net, opt),
                 None, batch, jax.random.PRNGKey(5))[1]
    m2 = step_fn(create_train_state(jax.random.PRNGKey(0), cfg, net, opt),
                 None, batch, jax.random.PRNGKey(5))[1]
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))


def test_kd_loss_kernel_variants_run():
    """--gtype energy/gaussian/laplacian ablations through the full KD path."""
    cfg, consts, batch = _setup()
    votes = _fake_teacher_votes(cfg, consts, batch)
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    variables = net.init(jax.random.PRNGKey(0), batch.images)
    cls_logits, pred_reg = net.apply(variables, batch.images, train=False)
    for gtype in ("energy", "gaussian", "laplacian"):
        c = cfg.replace(kd=dataclasses.replace(cfg.kd, gtype=gtype))
        out = pose_losses(jax.random.PRNGKey(1), cls_logits, pred_reg, batch,
                          consts, c, teacher=(votes, 640.0, 480.0))
        assert np.isfinite(float(out.loss_kd)), gtype
