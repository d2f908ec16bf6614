"""Fused GN-iteration kernel: window resample + residual in ONE Pallas
pass, with the steepest-descent projection left to the MXU.

The solver's iteration loop is HBM-bound in XLA: the lowering of
``sample_from_windows`` materializes the select-shift intermediates and
the residual/sd contraction re-reads the big tensors, moving ~550 MB per
GN iteration at the bench shape.  This kernel reads qwin (M,256) +
ref (M,128) once and emits the masked error image pdiff (M,128); the
rhs projection ``einsum(pdiff, sd)`` then runs as ONE batched matmul on
the MXU in XLA (sd is iteration-invariant and never enters the kernel —
3 KB/point/iteration of traffic gone vs. the previous design).

Layouts (prepared once per scale by the caller):

- ``qwin``: the (16,16) cached windows flattened to (M, 256)
  [16 rows x 16 lanes each],
- ``ref_s``/``sd_s``: patches in STRIDE-16 lane layout — each 8-pixel
  patch row occupies the first 8 lanes of a 16-lane group, garbage lanes
  zeroed.  The in-kernel resample naturally produces this layout, so
  pdiff needs no lane compaction before the MXU contraction.

In-kernel resample (all (T, 256) vector ops, no per-point loop): the
row/col window offset becomes ONE lane rotation of 16*row_w + col_w
(rotations compose), applied as a binary-decomposed chain of 6
conditional rolls (16/32/64 lanes for rows, 1/2/4 for cols) — 6 vector
selects per iteration instead of the 16 masked one-hot rolls of the
naive formulation.  The 4-tap bilinear blend is two vertical combines +
one single-lane roll.  Tap math is identical to ops/window_sample.py
(same ceil(+1e-5) bases, same weights): pure permutations + selects, so
results are bit-exact.
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


def _kernel_project(patch_norm, qwin_ref, ref_ref, dx_ref, dy_ref,
                    rowc_ref, wts_ref, valid_ref, out_ref):
    """Resample + error image + projection onto the gradient patches.

    The 6 steepest-descent planes factor as sd_k = jx_k * p_dx +
    jy_k * p_dy with PER-POINT Jacobian rows (the reference's 21-term
    Hessian trick, odometer.cpp:428-507), so the per-pixel work only
    ever needs (gx, gy) = (p_dx . pdiff, p_dy . pdiff); the 6-vector
    rhs = jx * gx + jy * gy is a tiny per-point contraction left to
    XLA.  The (M, 6, 128) sd tensor never exists on this path.
    """
    pdiff = _resample_pdiff(patch_norm, qwin_ref, ref_ref, rowc_ref,
                            wts_ref, valid_ref)
    gx = jnp.sum(dx_ref[...].astype(jnp.float32) * pdiff, axis=1,
                 keepdims=True)
    gy = jnp.sum(dy_ref[...].astype(jnp.float32) * pdiff, axis=1,
                 keepdims=True)
    out_ref[...] = jnp.concatenate([gx, gy], axis=1)


def _kernel(patch_norm, qwin_ref, ref_ref, rowc_ref, wts_ref,
            valid_ref, out_ref):
    out_ref[...] = _resample_pdiff(patch_norm, qwin_ref, ref_ref,
                                   rowc_ref, wts_ref, valid_ref)


def _resample_pdiff(patch_norm, qwin_ref, ref_ref, rowc_ref, wts_ref,
                    valid_ref):
    # window planes may arrive bfloat16 (cfg.bf16_gather halves HBM
    # traffic); all in-kernel arithmetic is f32
    sel = qwin_ref[...].astype(jnp.float32)  # (T, 256)
    row_w = rowc_ref[:, 0:1]             # (T, 1) f32 in [0, 7]
    col_w = rowc_ref[:, 1:2]

    # bring the (psz+1, psz+1) tap support to the window origin: one
    # rotation by 16*row_w + col_w lanes, binary-decomposed.  Taps only
    # read lanes [0, 9) of each 16-lane row group, and col shifts are
    # <= 7, so cross-row lane borrowing never reaches a read position.
    for amt in (4, 2, 1):
        b = row_w >= float(amt)
        row_w = row_w - float(amt) * b.astype(jnp.float32)
        sel = jnp.where(b, pltpu.roll(sel, 256 - WIN * amt, axis=1), sel)
    for amt in (4, 2, 1):
        b = col_w >= float(amt)
        col_w = col_w - float(amt) * b.astype(jnp.float32)
        sel = jnp.where(b, pltpu.roll(sel, 256 - amt, axis=1), sel)

    # 4-tap bilinear blend: patch[r,c] = w00 S[r+1,c+1] + w01 S[r+1,c]
    #                                  + w10 S[r,c+1]   + w11 S[r,c]
    w00 = wts_ref[:, 0:1]
    w01 = wts_ref[:, 1:2]
    w10 = wts_ref[:, 2:3]
    w11 = wts_ref[:, 3:4]
    up = pltpu.roll(sel, 256 - WIN, axis=1)         # S[r+1, c] at (r, c)
    A = w00 * up + w10 * sel                        # used at col c+1
    B = w01 * up + w11 * sel                        # used at col c
    patch = pltpu.roll(A, 255, axis=1) + B          # (T, 256)
    patch = patch[:, :PSZ * WIN]                    # (T, 128) strided

    # zero the garbage lanes (cols 8..15 of each group)
    lane = jax.lax.broadcasted_iota(jnp.int32, patch.shape, 1)
    lmask = jnp.where((lane % WIN) < PSZ, 1.0, 0.0)
    patch = patch * lmask
    if patch_norm:
        mean = jnp.sum(patch, axis=1, keepdims=True) * (1.0 / (PSZ * PSZ))
        patch = (patch - mean) * lmask

    return (ref_ref[...].astype(jnp.float32) - patch) \
        * valid_ref[:, 0:1] * lmask


@functools.partial(jax.jit, static_argnames=("patch_norm",))
def fused_resample_pdiff(qwin_flat: jnp.ndarray, ref_s: jnp.ndarray,
                         row_w: jnp.ndarray, col_w: jnp.ndarray,
                         wts: jnp.ndarray, valid: jnp.ndarray,
                         patch_norm: bool = False) -> jnp.ndarray:
    """One fused resample + error image over M points.

    qwin_flat: (M, 256); ref_s: (M, 128) stride-16; row_w/col_w: (M,)
    int32 in [0,7]; wts: (M, 4) f32 taps (w00, w01, w10, w11); valid:
    (M,) f32.  Returns the masked error image pdiff (M, 128) stride-16.
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
        out_shape=jax.ShapeDtypeStruct((M_pad, PSZ * WIN), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_T, PSZ * WIN), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(p(qwin_flat), p(ref_s), p(rowc), p(wts),
      p(valid.astype(jnp.float32)[:, None]))
    return out[:M]


@functools.partial(jax.jit, static_argnames=("patch_norm",))
def fused_resample_project(qwin_flat: jnp.ndarray, ref_s: jnp.ndarray,
                           pdx_s: jnp.ndarray, pdy_s: jnp.ndarray,
                           row_w: jnp.ndarray, col_w: jnp.ndarray,
                           wts: jnp.ndarray, valid: jnp.ndarray,
                           patch_norm: bool = False) -> jnp.ndarray:
    """One fused GN-iteration inner body over M points.

    qwin_flat: (M, 256); ref_s/pdx_s/pdy_s: (M, 128) stride-16 (ref
    patch and its gradient patches); row_w/col_w: (M,) int32 in [0,7];
    wts: (M, 4) f32; valid: (M,) f32.  Returns (M, 2) = (gx, gy), the
    error image projected onto the two gradient patches.
    """
    M = qwin_flat.shape[0]
    M_pad = ((M + _T - 1) // _T) * _T
    pad = M_pad - M

    def p(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    rowc = jnp.stack([row_w.astype(jnp.float32),
                      col_w.astype(jnp.float32)], axis=1)
    out = pl.pallas_call(
        functools.partial(_kernel_project, patch_norm),
        out_shape=jax.ShapeDtypeStruct((M_pad, 2), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_T, 2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(p(qwin_flat), p(ref_s), p(pdx_s), p(pdy_s), p(rowc), p(wts),
      p(valid.astype(jnp.float32)[:, None]))
    return out[:M]
