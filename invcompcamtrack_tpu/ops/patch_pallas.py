"""Pallas TPU kernels for sub-pixel patch gathering — the framework's
hottest op (SURVEY.md §6: the reference's util_getPatch/_grad dominate
its per-iteration cost; on TPU the XLA gather lowering costs ~1.5us per
patch, 6.5x slower than this kernel).

Design (see docs/kernels.md):

- the (padded) pyramid level lives whole in VMEM (a 1280x720 level 0 is
  ~4.5 MB — comfortably inside the ~16 MB VMEM),
- the grid walks point tiles of T=256; per point the kernel loads an
  aligned ``(16, 256)`` window (sublane start rounded to 8, lane start
  to 128 — Mosaic requires provably aligned starts), rotates it so the
  window origin lands at (0, 0) via two ``pltpu.roll`` ops, applies the
  4-tap constant bilinear weights, and stores the (psz, psz) patch,
- indices + weights are precomputed host-side (XLA) and streamed through
  SMEM block specs; 4 points per loop iteration amortize loop overhead
  (measured sweet spot),
- the 3-plane variant shares the index math across (I, dx, dy).

The public wrappers accept arbitrary leading batch dims over the shared
image, pad geometry/point counts to kernel requirements, and are exact
drop-ins for image/patch.py's XLA path (bit-identical taps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 256        # points per grid step
_UNROLL = 4     # points per loop iteration


def _win_rows(psz: int) -> int:
    # covers psz+1 rows at any sublane phase (start rounded down to 8)
    return ((psz + 1 + 7) // 8) * 8 + 8


def _win_cols(psz: int) -> int:
    # covers psz+1 cols at any lane phase (start rounded down to 128)
    return ((psz + 1 + 127) // 128) * 128 + 128


def pallas_available(dtype=jnp.float32) -> bool:
    """The kernels target real TPUs (Mosaic); CPU tests use the XLA path."""
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32


def _bilinear_base(centers, psz: int, padding: int):
    """Window origin + constant 4-tap weights — identical math to
    image/patch.py (reference: utilities.cpp:66-76)."""
    x = centers[..., 0]
    y = centers[..., 1]
    u0 = jnp.ceil(x + 1e-5).astype(jnp.int32)
    v0 = jnp.ceil(y + 1e-5).astype(jnp.int32)
    rx = x - jnp.floor(x)
    ry = y - jnp.floor(y)
    w = jnp.stack(
        [rx * ry, (1.0 - rx) * ry, rx * (1.0 - ry), (1.0 - rx) * (1.0 - ry)],
        axis=-1,
    )
    row0 = v0 - psz // 2 - 1 + padding
    col0 = u0 - psz // 2 - 1 + padding
    return row0, col0, w


def _pad_image(img, psz: int):
    """Pad so any clipped (row0, col0) admits an aligned window load."""
    H, W = img.shape
    H_pad = ((H + 7) // 8) * 8 + _win_rows(psz)
    W_pad = ((W + 127) // 128) * 128 + _win_cols(psz)
    return jnp.pad(img, ((0, H_pad - H), (0, W_pad - W)), mode="edge")


def _prep_indices(centers, psz, padding, H, W):
    flat = centers.reshape(-1, 2)
    M = flat.shape[0]
    row0, col0, w = _bilinear_base(flat, psz, padding)
    row0 = jnp.clip(row0, 0, H - 1)
    col0 = jnp.clip(col0, 0, W - 1)
    M_pad = ((M + _T - 1) // _T) * _T
    pad = M_pad - M
    row0 = jnp.pad(row0, (0, pad))
    col0 = jnp.pad(col0, (0, pad))
    w = jnp.pad(w, ((0, pad), (0, 0)))
    return jnp.stack([row0, col0], axis=1), w.astype(jnp.float32), M, M_pad


def _load_window(img_ref, r, c, psz):
    wr, wc = _win_rows(psz), _win_cols(psz)
    r_al = (r // 8) * 8
    c_al = (c // 128) * 128
    win = img_ref[pl.ds(r_al, wr), pl.ds(c_al, wc)]
    win = pltpu.roll(win, wr - (r - r_al), axis=0)
    return pltpu.roll(win, wc - (c - c_al), axis=1)


def _tap(win, w_ref, i, psz):
    return (
        w_ref[i, 0] * win[1:psz + 1, 1:psz + 1]
        + w_ref[i, 1] * win[1:psz + 1, 0:psz]
        + w_ref[i, 2] * win[0:psz, 1:psz + 1]
        + w_ref[i, 3] * win[0:psz, 0:psz]
    )


def _kernel_single(psz, idx_ref, w_ref, img_ref, out_ref):
    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            win = _load_window(img_ref, idx_ref[i, 0], idx_ref[i, 1], psz)
            out_ref[i] = _tap(win, w_ref, i, psz)
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


def _kernel_grad(psz, idx_ref, w_ref, img_ref, dx_ref, dy_ref,
                 out_i_ref, out_dx_ref, out_dy_ref):
    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            r = idx_ref[i, 0]
            c = idx_ref[i, 1]
            out_i_ref[i] = _tap(_load_window(img_ref, r, c, psz), w_ref, i, psz)
            out_dx_ref[i] = _tap(_load_window(dx_ref, r, c, psz), w_ref, i, psz)
            out_dy_ref[i] = _tap(_load_window(dy_ref, r, c, psz), w_ref, i, psz)
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


@functools.partial(jax.jit, static_argnames=("psz", "padding", "patch_norm"))
def gather_patches(img: jnp.ndarray, centers: jnp.ndarray, psz: int,
                   padding: int, patch_norm: bool = False) -> jnp.ndarray:
    """Pallas twin of image.patch.extract_patches.

    img: (Hp, Wp) float32 padded level; centers: (..., 2) -> (..., psz, psz).
    """
    img_p = _pad_image(img, psz)
    Hp, Wp = img_p.shape
    idx, w, M, M_pad = _prep_indices(centers, psz, padding, img.shape[0], img.shape[1])

    out = pl.pallas_call(
        functools.partial(_kernel_single, psz),
        out_shape=jax.ShapeDtypeStruct((M_pad, psz, psz), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((Hp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_T, psz, psz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
    )(idx, w, img_p)

    patches = out[:M].reshape(centers.shape[:-1] + (psz, psz))
    if patch_norm:
        patches = patches - jnp.mean(patches, axis=(-2, -1), keepdims=True)
    return patches


# fused 3-plane kernel must fit: 3 planes + in/out blocks inside ~16MB VMEM
_FUSED_VMEM_BUDGET = 11 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("psz", "padding", "patch_norm"))
def gather_patches_grad(img: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray,
                        centers: jnp.ndarray, psz: int, padding: int,
                        patch_norm: bool = False):
    """Pallas twin of image.patch.extract_patches_grad (3 planes, shared
    index math).  Large levels (3 planes would overflow VMEM) fall back
    to three single-plane kernel launches."""
    H_pad = ((img.shape[0] + 7) // 8) * 8 + _win_rows(psz)
    W_pad = ((img.shape[1] + 127) // 128) * 128 + _win_cols(psz)
    if 3 * H_pad * W_pad * 4 > _FUSED_VMEM_BUDGET:
        p_img = gather_patches(img, centers, psz, padding, patch_norm=False)
        p_dx = gather_patches(dx, centers, psz, padding, patch_norm=False)
        p_dy = gather_patches(dy, centers, psz, padding, patch_norm=False)
        if patch_norm:
            p_img = p_img - jnp.mean(p_img, axis=(-2, -1), keepdims=True)
        return p_img, p_dx, p_dy

    img_p = _pad_image(img, psz)
    dx_p = _pad_image(dx, psz)
    dy_p = _pad_image(dy, psz)
    Hp, Wp = img_p.shape
    idx, w, M, M_pad = _prep_indices(centers, psz, padding, img.shape[0], img.shape[1])

    spec_img = pl.BlockSpec((Hp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((_T, psz, psz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((M_pad, psz, psz), jnp.float32)
    out_i, out_dx, out_dy = pl.pallas_call(
        functools.partial(_kernel_grad, psz),
        out_shape=(shape, shape, shape),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                spec_img, spec_img, spec_img,
            ],
            out_specs=(spec_out, spec_out, spec_out),
        ),
    )(idx, w, img_p, dx_p, dy_p)

    shp = centers.shape[:-1] + (psz, psz)
    p_img = out_i[:M].reshape(shp)
    p_dx = out_dx[:M].reshape(shp)
    p_dy = out_dy[:M].reshape(shp)
    if patch_norm:
        p_img = p_img - jnp.mean(p_img, axis=(-2, -1), keepdims=True)
    return p_img, p_dx, p_dy


# ---------------- integer window gather (for the window cache) ----------------

def _kernel_windows(wh, ww, idx_ref, img_ref, out_ref):
    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            r = idx_ref[i, 0]
            c = idx_ref[i, 1]
            r_al = (r // 8) * 8
            c_al = (c // 128) * 128
            rows = ((wh + 7) // 8) * 8 + 8
            cols = ((ww + 127) // 128) * 128 + 128
            win = img_ref[pl.ds(r_al, rows), pl.ds(c_al, cols)]
            win = pltpu.roll(win, rows - (r - r_al), axis=0)
            win = pltpu.roll(win, cols - (c - c_al), axis=1)
            out_ref[i] = win[:wh, :ww]
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


@functools.partial(jax.jit, static_argnames=("wh", "ww"))
def gather_windows(img: jnp.ndarray, origins: jnp.ndarray, wh: int, ww: int):
    """Gather (..., wh, ww) integer-origin windows from a 2D image.

    origins: (..., 2) int32 (row, col) into the *padded* image.  Fuel for
    the solver's window cache: gathered once per scale, then every GN
    iteration resamples patches from the dense window tensor with pure
    vector math (ops.window_sample) instead of a per-point gather.
    """
    H, W = img.shape
    rows = ((wh + 7) // 8) * 8 + 8
    cols = ((ww + 127) // 128) * 128 + 128
    H_pad = ((H + 7) // 8) * 8 + rows
    W_pad = ((W + 127) // 128) * 128 + cols
    img_p = jnp.pad(img, ((0, H_pad - H), (0, W_pad - W)), mode="edge")

    flat = origins.reshape(-1, 2)
    M = flat.shape[0]
    r0 = jnp.clip(flat[:, 0], 0, H - 1)
    c0 = jnp.clip(flat[:, 1], 0, W - 1)
    M_pad = ((M + _T - 1) // _T) * _T
    r0 = jnp.pad(r0, (0, M_pad - M))
    c0 = jnp.pad(c0, (0, M_pad - M))
    idx = jnp.stack([r0, c0], axis=1)

    out = pl.pallas_call(
        functools.partial(_kernel_windows, wh, ww),
        out_shape=jax.ShapeDtypeStruct((M_pad, wh, ww), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((H_pad, W_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_T, wh, ww), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(idx, img_p)
    return out[:M].reshape(origins.shape[:-1] + (wh, ww))
