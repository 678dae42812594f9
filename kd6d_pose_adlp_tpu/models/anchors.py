"""Static anchor grids.

The reference builds per-image `BoxList` anchors with a Python loop every
forward pass (`models/model.py:190-367`). With 1 square anchor per cell
(aspect 1.0, 1 scale/octave — `models/model.py:349-367`) the whole machinery
reduces to a constant (cx, cy, w, h) table per (input_res, strides, sizes):

  cx = (col + 0.5) * stride,  cy = (row + 0.5) * stride,  w = h = size

which matches the reference exactly: base anchor = [1,1,s,s]-0.5 centered at
s/2 with side `size` under the x2-x1+1 width convention
(`models/model.py:296-347`, TO_REMOVE=1 in `models/model.py:115-119`).

We precompute it once as a NumPy array and close over it in compiled code.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np


@functools.lru_cache(maxsize=None)
def make_anchors(input_res: int, strides: Tuple[int, ...], sizes: Tuple[int, ...]) -> np.ndarray:
    """Returns (A, 4) float32 [cx, cy, w, h], levels concatenated coarsest-last,
    rows in row-major (y, x) order per level (matches reference grid_anchors)."""
    assert len(strides) == len(sizes)
    out = []
    for stride, size in zip(strides, sizes):
        g = input_res // stride
        ys = (np.arange(g, dtype=np.float32) + 0.5) * stride
        xs = (np.arange(g, dtype=np.float32) + 0.5) * stride
        cy, cx = np.meshgrid(ys, xs, indexing="ij")
        lvl = np.stack(
            [cx.reshape(-1), cy.reshape(-1),
             np.full(g * g, float(size), np.float32),
             np.full(g * g, float(size), np.float32)], axis=1)
        out.append(lvl)
    return np.concatenate(out, axis=0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def level_ids(input_res: int, strides: Tuple[int, ...]) -> np.ndarray:
    """(A,) int32 level index of each anchor."""
    out = []
    for li, stride in enumerate(strides):
        g = input_res // stride
        out.append(np.full(g * g, li, np.int32))
    return np.concatenate(out)


def level_slices(input_res: int, strides: Sequence[int]):
    """[(start, end)] per level into the flat anchor axis."""
    spans, start = [], 0
    for stride in strides:
        g = input_res // stride
        spans.append((start, start + g * g))
        start += g * g
    return spans
