"""Hierarchical binary surface codes (ZebraPose-style dense correspondences).

BASELINE.json configs[5] names a "ZebraPose-style dense 16D binary-code
local predictions" variant as the framework's stretch configuration. The
idea (Su et al., CVPR 2022 — re-derived here, no reference code exists for
it in /root/reference): each mesh-surface point gets a d-bit binary code
from a balanced hierarchical bisection of the vertex set; the network
regresses, per cell, the d code bits of the surface point it corresponds
to. Decoding a predicted code walks the partition tree and lands on one
vertex, so every confident cell yields one 2D-3D correspondence for PnP —
dense correspondences instead of the 8 bbox-corner keypoints.

TPU-first design decisions:
- Code construction is host-side NumPy at dataset-build time (per class,
  once): recursive principal-axis median splits, deterministic.
- Decoding is a single (cells, n_bits) x (n_bits, V) matmul + argmin on
  device: with bit weight w_i = 2^-i (strictly dominant over all later
  bits combined), the weighted-Hamming argmin over vertex codes IS the
  greedy tree walk for hard bits, and a smooth relaxation of it for soft
  (sigmoid) bits. No gather-heavy tree traversal, no dynamic shapes —
  the MXU does the walk.
- V need not be a power of two: groups that reach one vertex stop
  splitting and keep their remaining bits at 0; codes stay prefix-unique.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_hp = jax.lax.Precision.HIGHEST


def build_codes(verts: np.ndarray, n_bits: int) -> np.ndarray:
    """Balanced hierarchical bisection codes.

    verts (V, 3) float -> (V, n_bits) float32 in {0, 1}. Bit 0 is the most
    significant (root split). Each group splits at the median of the
    projection onto its principal axis; ties broken by stable sort, so the
    result is deterministic. Unique per vertex once V <= 2^n_bits.
    """
    verts = np.asarray(verts, np.float64)
    V = verts.shape[0]
    codes = np.zeros((V, n_bits), np.float32)
    groups = [np.arange(V)]
    for bit in range(n_bits):
        nxt = []
        for g in groups:
            if len(g) <= 1:
                nxt.append(g)
                continue
            X = verts[g] - verts[g].mean(0)
            try:
                _, s, vt = np.linalg.svd(X, full_matrices=False)
                d = vt[0]
                if not np.isfinite(d).all() or s[0] < 1e-12:
                    raise np.linalg.LinAlgError
            except np.linalg.LinAlgError:
                d = np.eye(3)[int(np.argmax(X.ptp(0)))]
            proj = X @ d
            order = np.argsort(proj, kind="stable")
            half = len(g) // 2
            hi = g[order[half:]]
            codes[hi, bit] = 1.0
            nxt.append(g[order[:half]])
            nxt.append(hi)
        groups = nxt
    return codes


def sample_box_surface(corners: np.ndarray, n_per_axis: int = 6) -> np.ndarray:
    """Deterministic grid sample of an axis-aligned box surface.

    corners (8, 3) from data/synthetic.make_box_corners ((sx,sy,sz) product
    order) -> (V, 3) float32 with V = 6 * n_per_axis^2 - duplicates removed
    (edges/corners appear on several faces). The synthetic-data stand-in
    for a real mesh's vertex set.
    """
    h = np.abs(np.asarray(corners, np.float64)).max(0)  # half sizes (3,)
    lin = [np.linspace(-h[i], h[i], n_per_axis) for i in range(3)]
    pts = []
    for axis in range(3):
        u, v = [a for a in range(3) if a != axis]
        gu, gv = np.meshgrid(lin[u], lin[v], indexing="ij")
        for sign in (-1.0, 1.0):
            f = np.zeros((n_per_axis * n_per_axis, 3))
            f[:, u] = gu.ravel()
            f[:, v] = gv.ravel()
            f[:, axis] = sign * h[axis]
            pts.append(f)
    pts = np.concatenate(pts, 0)
    pts = np.unique(np.round(pts, 6), axis=0)
    return pts.astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def decode_vertex(code_prob: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Weighted-Hamming argmin decode: soft bits -> vertex index.

    code_prob (..., n_bits) in [0, 1] (sigmoid outputs); codes (V, n_bits)
    in {0, 1}. cost(., v) = sum_i w_i * (p_i + c_vi - 2 p_i c_vi) with
    w_i = 2^-i, evaluated as one matmul: p @ (w - 2 w c)^T + const(v).
    Returns (...,) int32 vertex indices. For hard bits this equals the
    greedy partition-tree walk (w_i dominates sum_{j>i} w_j).
    """
    n_bits = codes.shape[-1]
    w = 2.0 ** (-jnp.arange(n_bits, dtype=jnp.float32))          # (nb,)
    cw = codes.astype(jnp.float32) * w                            # (V, nb)
    cost = (jnp.einsum("...i,vi->...v", code_prob.astype(jnp.float32),
                       w - 2.0 * cw, precision=_hp)
            + cw.sum(-1))                                         # (..., V)
    return jnp.argmin(cost, axis=-1).astype(jnp.int32)


def code_bce(code_logits: jnp.ndarray, code_tgt: jnp.ndarray,
             weight: jnp.ndarray) -> jnp.ndarray:
    """Per-bit sigmoid BCE summed over bits, weighted per element.

    code_logits (..., n_bits); code_tgt (..., n_bits) in [0, 1] (hard GT
    codes or a teacher's soft probabilities — same formula distills both);
    weight (...,) zeroing padded slots. Returns the unnormalized sum,
    matching the raw-sum convention of engine/losses.pose_losses.
    """
    z = code_logits.astype(jnp.float32)
    t = code_tgt.astype(jnp.float32)
    # numerically-stable BCE-with-logits: max(z,0) - z t + log1p(exp(-|z|))
    per_bit = jnp.maximum(z, 0.0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return (per_bit.sum(-1) * weight).sum()
