"""The distillation signal alone must teach the student: with a fabricated
perfect teacher and only the OT loss active, the student's decoded keypoints
move toward the teacher's clouds."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig, SolverConfig, TestConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.losses import pose_losses
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

RES, N_FG = 64, 3


def test_kd_only_training_reduces_ot_divergence():
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=RES),
                 solver=SolverConfig(max_objs=2, max_pos=32, ims_per_batch=2),
                 test=TestConfig(max_votes=16, ransac_iters=8),
                 kd=KDConfig(weight=5.0, max_teacher_cells=16))
    ds = SyntheticPoseDataset(n_fg=N_FG, input_res=RES, max_objs=2,
                              single_class=1, seed=9)
    consts = ds.consts()
    consts = consts._replace(kp3d=consts.kp3d[:N_FG],
                             diameters=consts.diameters[:N_FG])
    batch = ds.batch(range(2), train=True)

    # perfect teacher votes at the GT projections
    from kd6d_pose_adlp_tpu.models import coder
    from kd6d_pose_adlp_tpu.ops.voting import Votes
    B, T_CELLS = 2, cfg.kd.max_teacher_cells
    cls0 = jnp.clip(batch.class_ids[:, 0], 0)
    kp_int = coder.project_corners(consts.K, batch.rotations[:, 0],
                                   batch.translations[:, 0], consts.kp3d[cls0])
    votes = Votes(kp2d=jnp.broadcast_to(kp_int[:, None], (B, T_CELLS, 8, 2)),
                  score=jnp.full((B, T_CELLS), 0.9),
                  valid=jnp.ones((B, T_CELLS), bool),
                  box_size=jnp.full((B,), 64.0))

    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    variables = net.init(jax.random.PRNGKey(0), batch.images)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            cls_logits, pred_reg = net.apply(
                {"params": p, "batch_stats": stats}, batch.images, train=False)
            out = pose_losses(rng, cls_logits, pred_reg, batch, consts, cfg,
                              teacher=(votes, 640.0, 480.0))
            return out.loss_kd
        val, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, val

    vals = []
    for i in range(25):
        rng, sub = jax.random.split(rng)
        params, opt_state, v = step(params, opt_state, sub)
        vals.append(float(v))
        assert np.isfinite(vals[-1]), (i, vals)
    # KD-only optimization must substantially reduce the OT divergence
    assert np.mean(vals[-5:]) < 0.6 * np.mean(vals[:5]), vals
