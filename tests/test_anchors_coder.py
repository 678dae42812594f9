import numpy as np
import jax.numpy as jnp

from kd6d_pose_adlp_tpu.config import ModelConfig
from kd6d_pose_adlp_tpu.models import anchors as anc
from kd6d_pose_adlp_tpu.models import coder
from kd6d_pose_adlp_tpu.utils import geometry as geo


def test_level_geometry_tiny_and_53():
    tiny = ModelConfig(backbone="darknet_tiny_h")
    assert tiny.num_levels == 4
    assert tiny.level_strides == (8, 16, 32, 64)
    assert tiny.level_sizes == (32, 64, 128, 256)
    assert tiny.grid_sizes == (32, 16, 8, 4)
    assert tiny.num_cells == 1360  # 1024+256+64+16

    d53 = ModelConfig(backbone="darknet53")
    assert d53.num_levels == 5
    assert d53.num_cells == 1364
    assert d53.out_channel == 256 and tiny.out_channel == 128


def test_anchor_table_reference_values():
    m = ModelConfig(backbone="darknet_tiny_h")
    A = anc.make_anchors(m.input_res, m.level_strides, m.level_sizes)
    assert A.shape == (1360, 4)
    # level 0 (stride 8, size 32): first cell center at (4,4), row-major
    np.testing.assert_allclose(A[0], [4, 4, 32, 32])
    np.testing.assert_allclose(A[1], [12, 4, 32, 32])     # next column
    np.testing.assert_allclose(A[32], [4, 12, 32, 32])    # next row
    # level 1 starts at index 1024: stride 16 size 64
    np.testing.assert_allclose(A[1024], [8, 8, 64, 64])
    # last level (stride 64, size 256), last cell center
    np.testing.assert_allclose(A[-1], [256 - 32, 256 - 32, 256, 256])
    lid = anc.level_ids(m.input_res, m.level_strides)
    assert lid.shape == (1360,)
    assert (lid[:1024] == 0).all() and lid[-1] == 3


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    m = ModelConfig(backbone="darknet_tiny_h")
    A = jnp.asarray(anc.make_anchors(m.input_res, m.level_strides, m.level_sizes))
    kp2d = jnp.asarray(rng.uniform(0, 256, size=(1360, 8, 2)).astype(np.float32))
    enc = coder.encode(kp2d, A)
    assert enc.shape == (1360, 16)
    dec = coder.decode(enc, A)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(kp2d), atol=1e-3)


def test_decode_with_inverse_bbox_trans():
    rng = np.random.default_rng(1)
    # crop affine mapping 640x480 -> 256 crop
    M = geo.dzi_affine(np.array([320.0, 240.0]), 300.0, 256)
    Mj = jnp.asarray(M)[None].repeat(16, 0)
    A = jnp.asarray(anc.make_anchors(256, (8,), (32,)))[:16]
    pts_internal = rng.uniform(100, 500, size=(16, 8, 2)).astype(np.float32)
    pts_crop = geo.apply_affine(M, pts_internal.reshape(-1, 2)).reshape(16, 8, 2)
    enc = coder.encode(jnp.asarray(pts_crop), A)
    Minv = coder.invert_bbox_trans(Mj)
    dec = coder.decode(enc, A, Minv)
    np.testing.assert_allclose(np.asarray(dec), pts_internal, rtol=1e-4, atol=1e-2)


def test_project_corners_matches_host_projection():
    rng = np.random.default_rng(2)
    K = np.array([[572.4114, 0, 325.2611], [0, 573.57043, 242.04899], [0, 0, 1]], np.float32)
    R = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
    T = np.array([10.0, -20.0, 800.0], np.float32)
    corners = rng.uniform(-50, 50, size=(8, 3)).astype(np.float32)
    M = geo.dzi_affine(np.array([320.0, 240.0]), 384.0, 256)

    dev = coder.project_corners(jnp.asarray(K), jnp.asarray(R), jnp.asarray(T),
                                jnp.asarray(corners), jnp.asarray(M))
    host = geo.apply_affine(M, geo.project_points(K, R, T, corners))
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-4, atol=1e-2)

    # batched: vmap-like leading dims
    Rb = jnp.asarray(np.stack([R, R]))
    Tb = jnp.asarray(np.stack([T, T]))
    Cb = jnp.asarray(np.stack([corners, corners]))
    Mb = jnp.asarray(np.stack([M, M]))
    out = coder.project_corners(jnp.asarray(K), Rb, Tb, Cb, Mb)
    assert out.shape == (2, 8, 2)
    np.testing.assert_allclose(np.asarray(out[0]), host, rtol=1e-4, atol=1e-2)
