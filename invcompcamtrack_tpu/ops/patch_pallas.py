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


def _padded_geom(H: int, W: int, span: int, two_phase: bool = True):
    """Per-plane padded geometry admitting any clipped load.

    A window load starts at (8-aligned row, 128-aligned lane) and spans
    (_win_rows(span), lanes).  Two-phase: lane phases are < _PHASE after
    the split, so lanes = 128.  Single-phase (large images, where the
    stacked copy would overflow VMEM): lanes = 256 covers any phase.
    """
    Hp = ((H + 7) // 8) * 8 + _win_rows(span)
    Wp = ((W + 127) // 128) * 128 + (_LANES if two_phase else 2 * _LANES)
    return Hp, Wp


def _lanes(two_phase: bool) -> int:
    return _LANES if two_phase else 2 * _LANES


def _use_two_phase(H: int, W: int, span: int, n_planes: int = 1) -> bool:
    """Two-phase halves load width but doubles resident plane bytes;
    fall back to single-phase wide loads when the stack won't fit.

    The x2 allowance: under vmap (the multi-stream engine) Mosaic
    double-buffers the per-stream plane blocks, so the stacked plane
    must fit TWICE — and two-phase is speed-neutral (docs/kernels.md),
    so conceding it costs nothing."""
    Hp, Wp = _padded_geom(H, W, span, two_phase=True)
    return n_planes * 2 * Hp * Wp * 4 * 2 <= _VMEM_BUDGET


def _prep_plane(img, span: int, two_phase: bool):
    """Pad a plane; in two-phase mode stack it with its 64-lane-left-
    shifted copy.

    Two-phase returns (2*Hp, Wp): rows [0, Hp) hold the padded plane,
    rows [Hp, 2Hp) the same plane shifted left by _PHASE lanes.  Loads
    never reach the shifted copy's undefined right margin (window spans
    are <= _PHASE + span + 1 << the pad width).
    """
    H, W = img.shape
    Hp, Wp = _padded_geom(H, W, span, two_phase)
    img_p = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    if not two_phase:
        return img_p
    img_s = jnp.pad(img_p[:, _PHASE:], ((0, 0), (0, _PHASE)))
    return jnp.concatenate([img_p, img_s], axis=0)


def _prep_loads(row0, col0, span: int, H: int, W: int, two_phase: bool):
    """Host-side load plan: (load_r, load_c, roll_r, roll_c).

    Two-phase: load_r indexes the stacked (2*Hp, Wp) plane — points with
    lane phase >= 64 load from the shifted copy (rows offset by Hp) at
    phase o - 64.  Single-phase: plain aligned starts, 256-lane loads.
    """
    Hp, _ = _padded_geom(H, W, span, two_phase)
    row0 = jnp.clip(row0, 0, H - 1)
    col0 = jnp.clip(col0, 0, W - 1)
    r_al = (row0 // 8) * 8
    if two_phase:
        phase = col0 % _LANES
        sel = (phase >= _PHASE).astype(jnp.int32)
        c_eff = col0 - sel * _PHASE
        c_al = (c_eff // _LANES) * _LANES
        return (r_al + sel * Hp, c_al, row0 - r_al, c_eff - c_al)
    c_al = (col0 // _LANES) * _LANES
    return (r_al, c_al, row0 - r_al, col0 - c_al)


def _prep_indices(centers, psz, padding, H, W, span, two_phase,
                  with_origin: bool = False):
    flat = centers.reshape(-1, 2)
    M = flat.shape[0]
    row0, col0, w = _bilinear_base(flat, psz, padding)
    # with_origin (the fused-gradient kernel): load a 1-px halo around
    # the patch window and carry the un-shifted origin for the masks
    load = _prep_loads(row0 - 1, col0 - 1, span, H, W, two_phase) \
        if with_origin else _prep_loads(row0, col0, span, H, W, two_phase)
    cols = list(load) + ([row0, col0] if with_origin else [])
    M_pad = ((M + _T - 1) // _T) * _T
    pad = M_pad - M
    idx = jnp.stack(cols, axis=1)
    idx = jnp.pad(idx, ((0, pad), (0, 0)))
    w = jnp.pad(w, ((0, pad), (0, 0)))
    return idx, w.astype(jnp.float32), M, M_pad


def _point_plan(idx_ref, i, span: int, lanes: int):
    """Read one point's load plan from SMEM once (shared across planes).

    The //8*8 and //128*128 are numerical no-ops (the host already
    aligned the starts) that let Mosaic statically prove alignment.
    """
    wr = _win_rows(span)
    r = (idx_ref[i, 0] // 8) * 8
    c = (idx_ref[i, 1] // _LANES) * _LANES
    return r, c, wr - idx_ref[i, 2], lanes - idx_ref[i, 3]


def _load_planned(img_ref, plan, span: int, lanes: int):
    r, c, roll_r, roll_c = plan
    win = img_ref[pl.ds(r, _win_rows(span)), pl.ds(c, lanes)]
    win = pltpu.roll(win, roll_r, axis=0)
    return pltpu.roll(win, roll_c, axis=1)


def _load_window(img_ref, idx_ref, i, span: int, lanes: int):
    return _load_planned(img_ref, _point_plan(idx_ref, i, span, lanes),
                         span, lanes)


def _tap(win, w_ref, i, psz):
    return (
        w_ref[i, 0] * win[1:psz + 1, 1:psz + 1]
        + w_ref[i, 1] * win[1:psz + 1, 0:psz]
        + w_ref[i, 2] * win[0:psz, 1:psz + 1]
        + w_ref[i, 3] * win[0:psz, 0:psz]
    )


def _kernel_single(psz, lanes, idx_ref, w_ref, img_ref, out_ref):
    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            win = _load_window(img_ref, idx_ref, i, psz + 1, lanes)
            out_ref[i] = _tap(win, w_ref, i, psz)
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


def _kernel_grad_fused(psz, padding, H, W, lanes, idx_ref, w_ref, img_ref,
                       out_i_ref, out_dx_ref, out_dy_ref):
    """One image-window load per point; gradient patches are computed
    IN-KERNEL from the window instead of gathering the dx/dy planes.

    Exactness: the pyramid's gradient planes are central differences
    with reflect-101 borders, zero-padded (image/pyramid.py).  Both the
    reflect-101 boundary rows/cols and the pad band are exactly zero, so
    for every position where the plane is nonzero the difference
    ``V[c+1] - V[c-1]`` of the replicate-padded image window is the SAME
    subtraction of the SAME floats — in-kernel diff + a boundary mask is
    bit-identical to sampling the precomputed planes (3x fewer loads).
    """
    span = psz + 3  # patch support (psz+1) + 1-px halo each side
    q = psz + 1
    wr = _win_rows(span)
    rows_base = jax.lax.broadcasted_iota(jnp.int32, (wr, lanes), 0)
    cols_base = jax.lax.broadcasted_iota(jnp.int32, (wr, lanes), 1)

    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            plan = _point_plan(idx_ref, i, span, lanes)
            V = _load_planned(img_ref, plan, span, lanes)  # origin -1,-1
            row0 = idx_ref[i, 4]
            col0 = idx_ref[i, 5]
            # plane coords of V[a, b] are (row0 - 1 + a, col0 - 1 + b);
            # dx nonzero iff row in [pad, H-pad-1], col in [pad+1, W-pad-2]
            # (and transposed for dy) — zero everywhere else exactly as
            # the zero-padded reflect-101 plane is.
            rows_i = rows_base + (row0 - 1)
            cols_i = cols_base + (col0 - 1)
            r0ok = (rows_i >= padding) & (rows_i <= H - padding - 1)
            r1ok = (rows_i >= padding + 1) & (rows_i <= H - padding - 2)
            c0ok = (cols_i >= padding) & (cols_i <= W - padding - 1)
            c1ok = (cols_i >= padding + 1) & (cols_i <= W - padding - 2)
            mdx = jnp.where(r0ok & c1ok, 1.0, 0.0)[1:q + 1, 1:q + 1]
            mdy = jnp.where(r1ok & c0ok, 1.0, 0.0)[1:q + 1, 1:q + 1]
            Wi = V[1:q + 1, 1:q + 1]
            Wdx = (V[1:q + 1, 2:q + 2] - V[1:q + 1, 0:q]) * mdx
            Wdy = (V[2:q + 2, 1:q + 1] - V[0:q, 1:q + 1]) * mdy
            out_i_ref[i] = _tap(Wi, w_ref, i, psz)
            out_dx_ref[i] = _tap(Wdx, w_ref, i, psz)
            out_dy_ref[i] = _tap(Wdy, w_ref, i, psz)
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


@functools.partial(jax.jit, static_argnames=("psz", "padding", "patch_norm"))
def gather_patches(img: jnp.ndarray, centers: jnp.ndarray, psz: int,
                   padding: int, patch_norm: bool = False) -> jnp.ndarray:
    """Pallas twin of image.patch.extract_patches.

    img: (Hp, Wp) float32 padded level; centers: (..., 2) -> (..., psz, psz).
    """
    span = psz + 1
    H, W = img.shape
    two_phase = _use_two_phase(H, W, span)
    plane = _prep_plane(img, span, two_phase)
    Hs, Ws = plane.shape
    idx, w, M, M_pad = _prep_indices(
        centers, psz, padding, H, W, span, two_phase)

    out = pl.pallas_call(
        functools.partial(_kernel_single, psz, _lanes(two_phase)),
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
    )(idx, w, plane)

    patches = out[:M].reshape(centers.shape[:-1] + (psz, psz))
    if patch_norm:
        patches = patches - jnp.mean(patches, axis=(-2, -1), keepdims=True)
    return patches


# the resident plane (+ stacked copy) must fit VMEM alongside in/out blocks
_VMEM_BUDGET = 11 * 1024 * 1024


def dual_gather_fits_vmapped(H: int, W: int, win: int,
                             psz: int | None = None) -> bool:
    """Would the fused dual gather's two resident planes fit VMEM when
    Mosaic double-buffers them under vmap (the multi-stream engine)?
    Mirrors gather_ref_grad_and_windows' plane geometry by construction
    (span = max(psz + 3, win), as the kernel computes it); the engine
    flips ICGNParams.gather_split when this says no."""
    span = max((psz if psz is not None else 0) + 3, win)
    two_phase = _use_two_phase(H, W, span, n_planes=2) \
        and (win + _PHASE <= _LANES)
    Hp, Wp = _padded_geom(H, W, span, two_phase)
    pair = 2 * (2 if two_phase else 1) * Hp * Wp * 4
    # empirical anchors on the 16 MB VMEM: qHD fused+vmapped works
    # (2x5.5 = 11.05 MB of planes), 720p fails (2x9.1 = 18.3 MB); the
    # 14 MB line splits them with margin for outputs + SMEM
    return 2 * pair <= 14 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("psz", "padding", "patch_norm"))
def gather_patches_grad(img: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray,
                        centers: jnp.ndarray, psz: int, padding: int,
                        patch_norm: bool = False):
    """Pallas twin of image.patch.extract_patches_grad.

    The dx/dy planes are NOT gathered: the kernel loads one image window
    with a 1-px halo per point and computes the gradient patches from it
    in-kernel (bit-identical, see _kernel_grad_fused) — one load per
    point where the naive design needs three.  dx/dy args are accepted
    for API compatibility and ignored.
    """
    del dx, dy
    span = psz + 3
    H, W = img.shape
    two_phase = _use_two_phase(H, W, span)
    plane = _prep_plane(img, span, two_phase)
    Hs, Ws = plane.shape
    idx, w, M, M_pad = _prep_indices(
        centers, psz, padding, H, W, span, two_phase, with_origin=True)

    spec_img = pl.BlockSpec((Hs, Ws), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((_T, psz, psz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((M_pad, psz, psz), jnp.float32)
    out_i, out_dx, out_dy = pl.pallas_call(
        functools.partial(_kernel_grad_fused, psz, padding, H, W,
                          _lanes(two_phase)),
        out_shape=(shape, shape, shape),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 6), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                spec_img,
            ],
            out_specs=(spec_out, spec_out, spec_out),
        ),
    )(idx, w, plane)

    shp = centers.shape[:-1] + (psz, psz)
    p_img = out_i[:M].reshape(shp)
    p_dx = out_dx[:M].reshape(shp)
    p_dy = out_dy[:M].reshape(shp)
    if patch_norm:
        p_img = p_img - jnp.mean(p_img, axis=(-2, -1), keepdims=True)
    return p_img, p_dx, p_dy


def _kernel_grad_window(psz, padding, H, W, win, lanes, idx_ref, w_ref,
                        rimg_ref, qimg_ref,
                        out_i_ref, out_dx_ref, out_dy_ref, out_q_ref):
    """Per-scale dual gather in ONE launch: reference patch + in-kernel
    gradients (see _kernel_grad_fused) AND the query-image window cache.
    One shared point loop halves the per-point loop/launch overhead of
    running the two gathers as separate kernels."""
    span = max(psz + 3, win)  # one load geometry serves both planes
    q = psz + 1
    wr = _win_rows(span)
    rows_base = jax.lax.broadcasted_iota(jnp.int32, (wr, lanes), 0)
    cols_base = jax.lax.broadcasted_iota(jnp.int32, (wr, lanes), 1)

    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            plan = _point_plan(idx_ref, i, span, lanes)
            V = _load_planned(rimg_ref, plan, span, lanes)
            row0 = idx_ref[i, 4]
            col0 = idx_ref[i, 5]
            rows_i = rows_base + (row0 - 1)
            cols_i = cols_base + (col0 - 1)
            r0ok = (rows_i >= padding) & (rows_i <= H - padding - 1)
            r1ok = (rows_i >= padding + 1) & (rows_i <= H - padding - 2)
            c0ok = (cols_i >= padding) & (cols_i <= W - padding - 1)
            c1ok = (cols_i >= padding + 1) & (cols_i <= W - padding - 2)
            mdx = jnp.where(r0ok & c1ok, 1.0, 0.0)[1:q + 1, 1:q + 1]
            mdy = jnp.where(r1ok & c0ok, 1.0, 0.0)[1:q + 1, 1:q + 1]
            Wi = V[1:q + 1, 1:q + 1]
            Wdx = (V[1:q + 1, 2:q + 2] - V[1:q + 1, 0:q]) * mdx
            Wdy = (V[2:q + 2, 1:q + 1] - V[0:q, 1:q + 1]) * mdy
            out_i_ref[i] = _tap(Wi, w_ref, i, psz)
            out_dx_ref[i] = _tap(Wdx, w_ref, i, psz)
            out_dy_ref[i] = _tap(Wdy, w_ref, i, psz)
            wplan = (
                (idx_ref[i, 6] // 8) * 8,
                (idx_ref[i, 7] // _LANES) * _LANES,
                _win_rows(span) - idx_ref[i, 8],
                lanes - idx_ref[i, 9],
            )
            Wq = _load_planned(qimg_ref, wplan, span, lanes)
            out_q_ref[i] = Wq[:win, :win]
        return 0

    jax.lax.fori_loop(0, _T // _UNROLL, body, 0)


@functools.partial(jax.jit, static_argnames=("psz", "padding", "win",
                                             "patch_norm", "force_split"))
def gather_ref_grad_and_windows(ref_img: jnp.ndarray, query_img: jnp.ndarray,
                                centers: jnp.ndarray, origins: jnp.ndarray,
                                psz: int, padding: int, win: int,
                                patch_norm: bool = False,
                                force_split: bool = False):
    """Fused per-scale gather: (p_img, p_dx, p_dy) reference patches at
    sub-pixel ``centers`` from ``ref_img`` plus (win, win) integer-origin
    query windows from ``query_img`` — one kernel launch, one point loop.

    Falls back to two separate launches when the two resident planes
    don't fit VMEM together, or when ``force_split`` is set (the vmapped
    multi-stream engine: Mosaic double-buffers the per-stream planes, so
    the fused kernel's VMEM check — which cannot see the vmap from in
    here — under-counts by 2x at large frames; ICGNParams.gather_split).
    """
    span = max(psz + 3, win)
    H, W = ref_img.shape
    two_phase = _use_two_phase(H, W, span, n_planes=2) \
        and (win + _PHASE <= _LANES)
    Hp_geom, Wp_geom = _padded_geom(H, W, span, two_phase)
    if force_split or \
            2 * (2 if two_phase else 1) * Hp_geom * Wp_geom * 4 > _VMEM_BUDGET:
        p_img, p_dx, p_dy = gather_patches_grad(
            ref_img, ref_img, ref_img, centers, psz, padding,
            patch_norm=patch_norm)
        qwin = gather_windows(query_img, origins, win, win)
        return p_img, p_dx, p_dy, qwin

    # both planes use the LARGER span's geometry so one plan format works
    rplane = _prep_plane(ref_img, span, two_phase)
    qplane = _prep_plane(query_img, span, two_phase)
    Hs, Ws = rplane.shape

    flatc = centers.reshape(-1, 2)
    M = flatc.shape[0]
    row0, col0, w = _bilinear_base(flatc, psz, padding)
    ref_load = _prep_loads(row0 - 1, col0 - 1, span, H, W, two_phase)
    flato = origins.reshape(-1, 2)
    win_load = _prep_loads(flato[:, 0], flato[:, 1], span, H, W, two_phase)
    idx = jnp.stack(list(ref_load) + [row0, col0] + list(win_load), axis=1)
    M_pad = ((M + _T - 1) // _T) * _T
    idx = jnp.pad(idx, ((0, M_pad - M), (0, 0)))
    w = jnp.pad(w, ((0, M_pad - M), (0, 0))).astype(jnp.float32)

    spec_img = pl.BlockSpec((Hs, Ws), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((_T, psz, psz), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    pshape = jax.ShapeDtypeStruct((M_pad, psz, psz), jnp.float32)
    out_i, out_dx, out_dy, out_q = pl.pallas_call(
        functools.partial(_kernel_grad_window, psz, padding, H, W, win,
                          _lanes(two_phase)),
        out_shape=(pshape, pshape, pshape,
                   jax.ShapeDtypeStruct((M_pad, win, win), jnp.float32)),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T,),
            in_specs=[
                pl.BlockSpec((_T, 10), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((_T, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
                spec_img, spec_img,
            ],
            out_specs=(spec_p, spec_p, spec_p,
                       pl.BlockSpec((_T, win, win), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
        ),
    )(idx, w, rplane, qplane)

    shp = centers.shape[:-1] + (psz, psz)
    p_img = out_i[:M].reshape(shp)
    p_dx = out_dx[:M].reshape(shp)
    p_dy = out_dy[:M].reshape(shp)
    if patch_norm:
        p_img = p_img - jnp.mean(p_img, axis=(-2, -1), keepdims=True)
    qwin = out_q[:M].reshape(origins.shape[:-1] + (win, win))
    return p_img, p_dx, p_dy, qwin


# ---------------- integer window gather (for the window cache) ----------------

def _kernel_windows(wh, ww, lanes, idx_ref, img_ref, out_ref):
    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            win = _load_window(img_ref, idx_ref, i, max(wh, ww), lanes)
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
    two_phase = _use_two_phase(H, W, span) and (ww + _PHASE <= _LANES)
    plane = _prep_plane(img, span, two_phase)
    Hs, Ws = plane.shape

    flat = origins.reshape(-1, 2)
    M = flat.shape[0]
    load_r, load_c, roll_r, roll_c = _prep_loads(
        flat[:, 0], flat[:, 1], span, H, W, two_phase)
    M_pad = ((M + _T - 1) // _T) * _T
    idx = jnp.stack([load_r, load_c, roll_r, roll_c], axis=1)
    idx = jnp.pad(idx, ((0, M_pad - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel_windows, wh, ww, _lanes(two_phase)),
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
    )(idx, plane)
    return out[:M].reshape(origins.shape[:-1] + (wh, ww))
