"""Fused GN-iteration kernel: window resample + residual + steepest-
descent projection in ONE Pallas pass.

The solver's iteration loop is HBM-bound: the XLA lowering of
``sample_from_windows`` materializes the select-shift intermediates and
the residual/sd contraction re-reads the big tensors, moving ~550 MB per
GN iteration at the bench shape.  This kernel reads each operand exactly
once per iteration — qwin (M,256) + sd (M,768) + ref (M,128) ≈ 118 MB —
and emits only the per-point 6-vector rhs.

Layouts (prepared once per scale by the caller):

- ``qwin``: the (16,16) cached windows flattened to (M, 256)
  [16 rows x 16 lanes each],
- ``sd_s``/``ref_s``: patches in STRIDE-16 lane layout — each 8-pixel
  patch row occupies the first 8 lanes of a 16-lane group, garbage lanes
  zeroed.  This matches the layout the in-kernel resample naturally
  produces, so the contraction needs no lane compaction.

In-kernel resample (all (T, 256) vector ops, no per-point loop):
row-select and col-select become masked lane ``pltpu.roll`` sums
(8 offsets each), and the 4-tap bilinear blend becomes two vertical
combines + one single-lane roll.  Tap math is identical to
ops/window_sample.py (same ceil(+1e-5) bases, same weights) up to
float-add association.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 512  # points per grid step

WIN = 16   # window side (psz + 8 at psz=8)
PSZ = 8


def supported(psz: int, win: int, dtype=jnp.float32) -> bool:
    from invcompcamtrack_tpu.ops.patch_pallas import pallas_available

    return psz == PSZ and win == WIN and pallas_available(dtype)


def to_strided(patches: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) patches -> (..., 128) stride-16 lanes (zeros pad)."""
    p = jnp.pad(patches, [(0, 0)] * (patches.ndim - 1) + [(0, WIN - PSZ)])
    return p.reshape(patches.shape[:-2] + (PSZ * WIN,))


def _kernel(patch_norm, qwin_ref, sd_ref, ref_ref, rowc_ref, wts_ref,
            valid_ref, out_ref):
    # planes may arrive bfloat16 (cfg.bf16_gather halves HBM traffic);
    # all in-kernel arithmetic is f32
    q = qwin_ref[...].astype(jnp.float32)  # (T, 256)
    row_w = rowc_ref[:, 0:1]             # (T, 1) f32 in [0, 7]
    col_w = rowc_ref[:, 1:2]

    # row select: bring rows k..k+8 to the front for each point
    rowsel = jnp.zeros_like(q)
    for k in range(WIN - PSZ):
        m = jnp.where(row_w == float(k), 1.0, 0.0)
        rowsel = rowsel + m * pltpu.roll(q, 256 - WIN * k, axis=1)
    # col select: shift each row left by j lanes (within-row for j<=7)
    colsel = jnp.zeros_like(q)
    for j in range(WIN - PSZ):
        m = jnp.where(col_w == float(j), 1.0, 0.0)
        colsel = colsel + m * pltpu.roll(rowsel, 256 - j, axis=1)

    # 4-tap bilinear blend: patch[r,c] = w00 S[r+1,c+1] + w01 S[r+1,c]
    #                                  + w10 S[r,c+1]   + w11 S[r,c]
    w00 = wts_ref[:, 0:1]
    w01 = wts_ref[:, 1:2]
    w10 = wts_ref[:, 2:3]
    w11 = wts_ref[:, 3:4]
    up = pltpu.roll(colsel, 256 - WIN, axis=1)      # S[r+1, c] at (r, c)
    A = w00 * up + w10 * colsel                     # used at col c+1
    B = w01 * up + w11 * colsel                     # used at col c
    patch = pltpu.roll(A, 255, axis=1) + B          # (T, 256)
    patch = patch[:, :PSZ * WIN]                    # (T, 128) strided

    # zero the garbage lanes (cols 8..15 of each group)
    lane = jax.lax.broadcasted_iota(jnp.int32, patch.shape, 1)
    lmask = jnp.where((lane % WIN) < PSZ, 1.0, 0.0)
    patch = patch * lmask
    if patch_norm:
        mean = jnp.sum(patch, axis=1, keepdims=True) * (1.0 / (PSZ * PSZ))
        patch = (patch - mean) * lmask

    pdiff = (ref_ref[...].astype(jnp.float32) - patch) \
        * valid_ref[:, 0:1] * lmask

    # rhs_k = sum_lanes sd_k (.) pdiff   (garbage lanes are zero in sd)
    cols = []
    for k in range(6):
        sdk = sd_ref[:, k * 128:(k + 1) * 128].astype(jnp.float32)
        cols.append(jnp.sum(sdk * pdiff, axis=1, keepdims=True))
    out_ref[...] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("patch_norm",))
def fused_gn_rhs(qwin_flat: jnp.ndarray, sd_s: jnp.ndarray,
                 ref_s: jnp.ndarray, row_w: jnp.ndarray, col_w: jnp.ndarray,
                 wts: jnp.ndarray, valid: jnp.ndarray,
                 patch_norm: bool = False) -> jnp.ndarray:
    """One fused GN iteration over M points.

    qwin_flat: (M, 256); sd_s: (M, 768) stride-16; ref_s: (M, 128)
    stride-16; row_w/col_w: (M,) int32 in [0,7]; wts: (M, 4) f32 taps
    (w00, w01, w10, w11); valid: (M,) f32.  Returns rhs (M, 6).
    """
    M = qwin_flat.shape[0]
    M_pad = ((M + _T - 1) // _T) * _T
    pad = M_pad - M

    def p(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    rowc = jnp.stack([row_w.astype(jnp.float32),
                      col_w.astype(jnp.float32)], axis=1)
    out = pl.pallas_call(
        functools.partial(_kernel, patch_norm),
        out_shape=jax.ShapeDtypeStruct((M_pad, 6), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_T, 6), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(p(qwin_flat), p(sd_s), p(ref_s), p(rowc), p(wts),
      p(valid.astype(jnp.float32)[:, None]))
    return out[:M]
