"""Optical-flow visualization: the Middlebury color wheel.

Port of the reference's renderer (reference: misc_src/func_viz_flow.py:
12-100): 55-entry RY/YG/GC/CB/BM/MR wheel, optional log magnitude,
saturation increasing with radius, 0.75 dimming outside unit radius.
"""

from __future__ import annotations

import numpy as np


def make_colorwheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    cw = np.zeros((ncols, 3))
    col = 0
    cw[0:RY, 0] = 1
    cw[0:RY, 1] = np.arange(0, 1, 1.0 / RY)
    col += RY
    cw[col:col + YG, 0] = np.arange(1, 0, -1.0 / YG)
    cw[col:col + YG, 1] = 1
    col += YG
    cw[col:col + GC, 1] = 1
    cw[col:col + GC, 2] = np.arange(0, 1, 1.0 / GC)
    col += GC
    cw[col:col + CB, 1] = np.arange(1, 0, -1.0 / CB)
    cw[col:col + CB, 2] = 1
    col += CB
    cw[col:col + BM, 2] = 1
    cw[col:col + BM, 0] = np.arange(0, 1, 1.0 / BM)
    col += BM
    cw[col:col + MR, 2] = np.arange(1, 0, -1.0 / MR)
    cw[col:col + MR, 0] = 1
    return cw


def viz_flow(u: np.ndarray, v: np.ndarray, logscale: bool = True,
             scaledown: float = 6.0) -> np.ndarray:
    """(H, W) flow components -> (H, W, 3) uint8 rendering."""
    cw = make_colorwheel()
    ncols = cw.shape[0]
    radius = np.sqrt(u**2 + v**2)
    if logscale:
        radius = np.log(radius + 1)
    radius = radius / scaledown
    rot = np.arctan2(-v, -u) / np.pi
    fk = (rot + 1) / 2 * (ncols - 1)
    k0 = fk.astype(np.uint8)
    k1 = k0 + 1
    k1[k1 == ncols] = 0
    f = fk - k0
    img = np.zeros(u.shape + (3,))
    for i in range(3):
        col0 = cw[:, i][k0]
        col1 = cw[:, i][k1]
        col = (1 - f) * col0 + f * col1
        idx = radius <= 1
        col[idx] = 1 - radius[idx] * (1 - col[idx])
        col[~idx] *= 0.75
        img[:, :, i] = np.floor(255 * col)
    return img.astype(np.uint8)
