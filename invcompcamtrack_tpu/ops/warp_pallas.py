"""Pallas dense backward-warp kernel.

``out(x) = img(x + flow(x))`` — the inner operation of dense
coarse-to-fine LK (match/dense_flow.py).  As an XLA gather this costs
~1.5 us per pixel-slice on TPU (a full 720p warp would take seconds);
this kernel exploits flow smoothness:

- grid over (8, 128) output tiles,
- per tile, the host precomputes the MEAN integer flow; the kernel
  loads one aligned ``(16, 256)`` input window displaced by that mean
  (same aligned-load + roll pattern as the patch kernel),
- per-pixel RESIDUAL offsets (flow - tile mean) are handled by
  select-shift over the +-3 px slack and 2x2 bilinear weights — pure
  VPU math, no per-pixel addressing,
- residuals beyond the slack clamp (wrong only across sharp flow
  discontinuities; LK flow is smooth by construction).

~100x faster than the XLA warp at 720p; exact (same bilinear) wherever
the per-tile flow deviation stays within +-3 px.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR, _TC = 8, 128   # output tile
_H = 3              # slack (px) for per-pixel deviation from tile mean


def _kernel(mean_ref, u_ref, v_ref, img_ref, out_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    mu = mean_ref[ti, 2 * tj]
    mv = mean_ref[ti, 2 * tj + 1]

    # window origin in the padded image: tile origin + mean flow - slack - 1
    r = ti * _TR + mv
    c = tj * _TC + mu
    r_al = (r // 8) * 8
    c_al = (c // 128) * 128
    win = img_ref[pl.ds(r_al, 24), pl.ds(c_al, 384)]
    win = pltpu.roll(win, 24 - (r - r_al), axis=0)
    win = pltpu.roll(win, 384 - (c - c_al), axis=1)
    # win[0, 0] == img_padded[r, c]; sample support needs rows
    # [-(_H+1), _TR+_H] relative to the tile -> shift by _H+1 below.

    ru = u_ref[:, :] - mu.astype(win.dtype)
    rv = v_ref[:, :] - mv.astype(win.dtype)
    sy = jnp.clip(rv + (_H + 1), 0.0, 2.0 * _H + 1.0)
    sx = jnp.clip(ru + (_H + 1), 0.0, 2.0 * _H + 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    # exact 2D select over the (2H+2)^2 integer-offset combinations:
    # out(p,q) reads win[p + y0(p,q) + {0,1}, q + x0(p,q) + {0,1}].
    # (A separable row-then-column factorization would use y0 of the
    # wrong pixel wherever the integer offset changes within a row.)
    one = jnp.ones((), win.dtype)
    wa = (one - fy) * (one - fx)
    wb = (one - fy) * fx
    wc = fy * (one - fx)
    wd = fy * fx
    out = jnp.zeros((_TR, _TC), win.dtype)
    for ky in range(2 * _H + 2):
        rows_a = win[ky:ky + _TR, :]
        rows_b = win[ky + 1:ky + 1 + _TR, :]
        my = (y0 == ky)
        for kx in range(2 * _H + 2):
            m = (my & (x0 == kx)).astype(win.dtype)
            val = (
                wa * rows_a[:, kx:kx + _TC]
                + wb * rows_a[:, kx + 1:kx + 1 + _TC]
                + wc * rows_b[:, kx:kx + _TC]
                + wd * rows_b[:, kx + 1:kx + 1 + _TC]
            )
            out = out + m * val
    out_ref[:, :] = out


@jax.jit
def warp_image_pallas(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W) float32; flow: (H, W, 2) (dx, dy) -> warped (H, W).

    Pads to tile multiples internally; edge-clamped like the XLA warp.
    """
    H, W = img.shape
    Ht = ((H + _TR - 1) // _TR) * _TR
    Wt = ((W + _TC - 1) // _TC) * _TC

    # pad the image generously: slack + alignment + max-mean handled by
    # clamping means into the padded interior
    pad = _H + 1
    img_p = jnp.pad(img, ((pad, 0), (pad, 0)), mode="edge")
    Hp = ((Ht + pad + 7) // 8) * 8 + 32
    Wp = ((Wt + pad + 127) // 128) * 128 + 512
    img_p = jnp.pad(
        img_p, ((0, Hp - img_p.shape[0]), (0, Wp - img_p.shape[1])),
        mode="edge",
    )

    u = jnp.pad(flow[..., 0], ((0, Ht - H), (0, Wt - W)))
    v = jnp.pad(flow[..., 1], ((0, Ht - H), (0, Wt - W)))

    nti, ntj = Ht // _TR, Wt // _TC
    # per-tile mean integer flow, clamped so windows stay in bounds
    mu = jnp.round(u.reshape(nti, _TR, ntj, _TC).mean((1, 3))).astype(jnp.int32)
    mv = jnp.round(v.reshape(nti, _TR, ntj, _TC).mean((1, 3))).astype(jnp.int32)
    # window rows span [tile_r + mv, +24): keep inside [0, Hp)
    row_lo = -(jnp.arange(nti) * _TR)[:, None]
    mv = jnp.clip(mv, row_lo, Hp - 24 - (jnp.arange(nti) * _TR)[:, None])
    col_lo = -(jnp.arange(ntj) * _TC)[None, :]
    mu = jnp.clip(mu, col_lo, Wp - 384 - (jnp.arange(ntj) * _TC)[None, :])
    # interleave (mu, mv) pairs along the last axis: (nti, 2*ntj)
    means = jnp.stack([mu, mv], axis=-1).reshape(nti, 2 * ntj)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Ht, Wt), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(nti, ntj),
            in_specs=[
                # whole means table in SMEM (tiny); indexed by program id
                pl.BlockSpec((nti, 2 * ntj), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((_TR, _TC), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_TR, _TC), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Hp, Wp), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_TR, _TC), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
    )(means, u, v, img_p)
    return out[:H, :W]
