"""Pallas TPU kernels for sub-pixel patch gathering — the framework's
hottest op (SURVEY.md §6: the reference's util_getPatch/_grad dominate
its per-iteration cost; on TPU the XLA gather lowering costs ~1.5us per
patch, 6.5x slower than this kernel).

Design (see docs/kernels.md):

- the (padded) pyramid level lives in VMEM TWICE: the plane is stacked
  with a 64-lane-shifted copy of itself ("two-phase alignment").  Mosaic
  requires 128-lane-aligned load starts; without the copy every window
  load must span (rows, 256) to cover an arbitrary lane phase.  With it,
  a point whose lane phase is >= 64 loads from the shifted copy at phase
  (o - 64) < 64 instead — so every window is (rows, 128): half the load
  bytes and half the lane-roll work per point,
- the grid walks point tiles of T=256; per point the kernel loads the
  aligned ``(rows, 128)`` window (start fully precomputed host-side),
  rotates the origin to (0, 0) via two ``pltpu.roll`` ops, applies the
  4-tap constant bilinear weights, and stores the (psz, psz) patch,
- indices + weights are precomputed host-side (XLA) and streamed through
  SMEM block specs; 4 points per loop iteration amortize loop overhead
  (measured sweet spot),
- the 3-plane variant shares the index math across (I, dx, dy).

The public wrappers accept arbitrary leading batch dims over the shared
image, pad geometry/point counts to kernel requirements, and are exact
drop-ins for image/patch.py's XLA path (bit-identical taps: the stacked
copy holds identical values, only the alignment path differs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 256        # points per grid step (512 overflows VMEM at 720p)
_UNROLL = 4     # points per loop iteration.  Standalone microbenches
#                 prefer 16 (4.3ms vs 7.5ms for the 3-plane gather), but
#                 EMBEDDED in the solver program 4 wins (53ms vs 65ms
#                 per call): shorter per-grid-step latency pipelines
#                 better against the surrounding XLA ops.
_PHASE = 64     # lane-phase split of the two-phase alignment scheme
_LANES = 128


def _win_rows(span: int) -> int:
    # covers `span` rows at any sublane phase (start rounded down to 8)
    return ((span + 7) // 8) * 8 + 8


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


def _padded_geom(H: int, W: int, span: int):
    """Per-plane padded geometry admitting any clipped two-phase load.

    A window load starts at (8-aligned row, 128-aligned lane) and spans
    (_win_rows(span), 128); lane phases are < _PHASE after the two-phase
    split, so the max lane touched is ceil128(W - 1 - _PHASE) + 128.
    """
    Hp = ((H + 7) // 8) * 8 + _win_rows(span)
    Wp = ((W + 127) // 128) * 128 + _LANES
    return Hp, Wp


def _stack_2phase(img, span: int):
    """Pad a plane and stack it with its 64-lane-left-shifted copy.

    Returns (2*Hp, Wp): rows [0, Hp) hold the padded plane, rows
    [Hp, 2Hp) hold the same plane shifted left by _PHASE lanes.  Loads
    never reach the shifted copy's undefined right margin (window spans
    are <= _PHASE + span + 1 << the pad width).
    """
    H, W = img.shape
    Hp, Wp = _padded_geom(H, W, span)
    img_p = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    img_s = jnp.pad(img_p[:, _PHASE:], ((0, 0), (0, _PHASE)))
    return jnp.concatenate([img_p, img_s], axis=0)


def _prep_loads(row0, col0, span: int, H: int, W: int):
    """Host-side two-phase load plan: (load_r, load_c, roll_r, roll_c).

    load_r indexes the stacked (2*Hp, Wp) plane: phase->=64 points load
    from the shifted copy (rows offset by Hp) at lane phase o - 64.
    """
    Hp, _ = _padded_geom(H, W, span)
    row0 = jnp.clip(row0, 0, H - 1)
    col0 = jnp.clip(col0, 0, W - 1)
    r_al = (row0 // 8) * 8
    phase = col0 % _LANES
    sel = (phase >= _PHASE).astype(jnp.int32)
    c_eff = col0 - sel * _PHASE
    c_al = (c_eff // _LANES) * _LANES
    return (r_al + sel * Hp, c_al, row0 - r_al, c_eff - c_al)


def _prep_indices(centers, psz, padding, H, W, span):
    flat = centers.reshape(-1, 2)
    M = flat.shape[0]
    row0, col0, w = _bilinear_base(flat, psz, padding)
    load_r, load_c, roll_r, roll_c = _prep_loads(row0, col0, span, H, W)
    M_pad = ((M + _T - 1) // _T) * _T
    pad = M_pad - M
    idx = jnp.stack([load_r, load_c, roll_r, roll_c], axis=1)
    idx = jnp.pad(idx, ((0, pad), (0, 0)))
    w = jnp.pad(w, ((0, pad), (0, 0)))
    return idx, w.astype(jnp.float32), M, M_pad


def _point_plan(idx_ref, i, span: int):
    """Read one point's load plan from SMEM once (shared across planes).

    The //8*8 and //128*128 are numerical no-ops (the host already
    aligned the starts) that let Mosaic statically prove alignment.
    """
    wr = _win_rows(span)
    r = (idx_ref[i, 0] // 8) * 8
    c = (idx_ref[i, 1] // _LANES) * _LANES
    return r, c, wr - idx_ref[i, 2], _LANES - idx_ref[i, 3]


def _load_planned(img_ref, plan, span: int):
    r, c, roll_r, roll_c = plan
    win = img_ref[pl.ds(r, _win_rows(span)), pl.ds(c, _LANES)]
    win = pltpu.roll(win, roll_r, axis=0)
    return pltpu.roll(win, roll_c, axis=1)


def _load_window(img_ref, idx_ref, i, span: int):
    return _load_planned(img_ref, _point_plan(idx_ref, i, span), span)


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
            win = _load_window(img_ref, idx_ref, i, psz + 1)
            out_ref[i] = _tap(win, w_ref, i, psz)
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


def _kernel_grad(psz, idx_ref, w_ref, img_ref, dx_ref, dy_ref,
                 out_i_ref, out_dx_ref, out_dy_ref):
    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            plan = _point_plan(idx_ref, i, psz + 1)
            out_i_ref[i] = _tap(_load_planned(img_ref, plan, psz + 1),
                                w_ref, i, psz)
            out_dx_ref[i] = _tap(_load_planned(dx_ref, plan, psz + 1),
                                 w_ref, i, psz)
            out_dy_ref[i] = _tap(_load_planned(dy_ref, plan, psz + 1),
                                 w_ref, i, psz)
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


@functools.partial(jax.jit, static_argnames=("psz", "padding", "patch_norm"))
def gather_patches(img: jnp.ndarray, centers: jnp.ndarray, psz: int,
                   padding: int, patch_norm: bool = False) -> jnp.ndarray:
    """Pallas twin of image.patch.extract_patches.

    img: (Hp, Wp) float32 padded level; centers: (..., 2) -> (..., psz, psz).
    """
    span = psz + 1
    stacked = _stack_2phase(img, span)
    Hs, Ws = stacked.shape
    idx, w, M, M_pad = _prep_indices(
        centers, psz, padding, img.shape[0], img.shape[1], span)

    out = pl.pallas_call(
        functools.partial(_kernel_single, psz),
        out_shape=jax.ShapeDtypeStruct((M_pad, psz, psz), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((Hs, Ws), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_T, psz, psz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
    )(idx, w, stacked)

    patches = out[:M].reshape(centers.shape[:-1] + (psz, psz))
    if patch_norm:
        patches = patches - jnp.mean(patches, axis=(-2, -1), keepdims=True)
    return patches


# fused 3-plane kernel must fit: 3 two-phase-stacked planes + in/out
# blocks inside ~16MB VMEM
_FUSED_VMEM_BUDGET = 11 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("psz", "padding", "patch_norm"))
def gather_patches_grad(img: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray,
                        centers: jnp.ndarray, psz: int, padding: int,
                        patch_norm: bool = False):
    """Pallas twin of image.patch.extract_patches_grad (3 planes, shared
    index math).  Large levels (3 stacked planes would overflow VMEM)
    fall back to three single-plane kernel launches."""
    span = psz + 1
    Hp, Wp = _padded_geom(img.shape[0], img.shape[1], span)
    if 3 * 2 * Hp * Wp * 4 > _FUSED_VMEM_BUDGET:
        p_img = gather_patches(img, centers, psz, padding, patch_norm=False)
        p_dx = gather_patches(dx, centers, psz, padding, patch_norm=False)
        p_dy = gather_patches(dy, centers, psz, padding, patch_norm=False)
        if patch_norm:
            p_img = p_img - jnp.mean(p_img, axis=(-2, -1), keepdims=True)
        return p_img, p_dx, p_dy

    img_2 = _stack_2phase(img, span)
    dx_2 = _stack_2phase(dx, span)
    dy_2 = _stack_2phase(dy, span)
    Hs, Ws = img_2.shape
    idx, w, M, M_pad = _prep_indices(
        centers, psz, padding, img.shape[0], img.shape[1], span)

    spec_img = pl.BlockSpec((Hs, Ws), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((_T, psz, psz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((M_pad, psz, psz), jnp.float32)
    out_i, out_dx, out_dy = pl.pallas_call(
        functools.partial(_kernel_grad, psz),
        out_shape=(shape, shape, shape),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                spec_img, spec_img, spec_img,
            ],
            out_specs=(spec_out, spec_out, spec_out),
        ),
    )(idx, w, img_2, dx_2, dy_2)

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
            win = _load_window(img_ref, idx_ref, i, max(wh, ww))
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
    span = max(wh, ww)
    assert ww + _PHASE <= _LANES, "window too wide for two-phase loads"
    stacked = _stack_2phase(img, span)
    Hs, Ws = stacked.shape

    flat = origins.reshape(-1, 2)
    M = flat.shape[0]
    load_r, load_c, roll_r, roll_c = _prep_loads(
        flat[:, 0], flat[:, 1], span, H, W)
    M_pad = ((M + _T - 1) // _T) * _T
    idx = jnp.stack([load_r, load_c, roll_r, roll_c], axis=1)
    idx = jnp.pad(idx, ((0, M_pad - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel_windows, wh, ww),
        out_shape=jax.ShapeDtypeStruct((M_pad, wh, ww), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((Hs, Ws), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_T, wh, ww), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(idx, stacked)
    return out[:M].reshape(origins.shape[:-1] + (wh, ww))
