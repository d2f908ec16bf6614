"""Prefetch-pipelined dual gather: the round-4 redesign of the per-scale
sub-pixel patch gather (ops/patch_pallas.py::gather_ref_grad_and_windows).

The shipped kernel is LATENCY-bound: each point performs a serial
chain (scalar address -> dynamic aligned (24,128/256) VMEM load ->
sublane roll -> lane roll -> taps), measured at 196-217 ns/pt = the
empirical per-load floor of Mosaic dynamic window loads
(docs/kernels.md, Gather roofline).  This module attacks every link:

1. **Loads move off the critical path.**  A ``PrefetchScalarGridSpec``
   grid over groups of G points names each point's window block through
   a scalar-prefetched index map, so the Pallas pipeline DMAs blocks
   HBM->VMEM ahead of the body (double-buffered).  The planes are
   HBM-resident — VMEM holds only in-flight blocks, so the two-phase
   lane-split geometry is free at ANY image size (no 720p fallback, no
   vmap double-buffer overflow).
2. **One DMA per point per plane.**  Naive per-(8,128)-row-block specs
   were DMA-issue-bound (3x slower).  Each plane is stored as a stack
   of row-shifted copies so any needed window is ONE (1, 24, 128)
   block: with 24 copies (shift 0..23 rows) the window's exact first
   row lands at a 24-aligned block start — the sublane roll disappears
   entirely.  (HBM cost: 24x the padded plane; prep is a bandwidth-
   bound XLA concat, amortized per level.)
3. **Lean body.**  Per point the kernel does ONE dynamic lane roll per
   plane and writes the aligned raw windows; bilinear taps, in-window
   gradients and their boundary masks run AFTER the kernel as plain
   vectorized XLA over the (M, 24, 24) / (M, win, win) tensors
   (elementwise, HBM-bandwidth-bound, ~3 ns/pt) — identical formulas,
   identical float op order, so results match the shipped kernel
   bit-for-bit (verified by tests/test_patch_prefetch.py and the exact=
   checks of the round-4 probe campaign).

Reference hot loops [4]/[8]: odometer.cpp:159,163 (26.1 + 19.9 us per
100 patches per scale on one core).

MEASURED VERDICT (round 5, TPU v5e, bench shape M=25,600, 720p pyramid;
docs/kernels.md §"The prefetch-pipelined gather"): **2.1x SLOWER than
the shipped kernel** — 420 ns/pt end-to-end vs 193 ns/pt (shipped),
flat across pyramid levels, outputs bit-identical (maxerr 0.0).
Decomposition: plan (two 24-copy shift stacks, 227 MB HBM) 2.6 ms +
postpass 1.5 ms + kernel 7.0 ms = 275 ns/pt for the KERNEL ALONE —
i.e. two per-point HBM block DMAs (~137 ns per descriptor, issue-bound
at 16 descriptors per grid step) cost more than the shipped kernel's
entire VMEM load+roll+roll+tap chain (~100 ns per load).  The Pallas
pipeline cannot hide DMA *issue* cost, only DMA *latency*.  The module
is kept as the measured record of the one remaining redesign of the
gather; ``ICGNParams.gather_prefetch`` stays available and off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from invcompcamtrack_tpu.ops.patch_pallas import (
    _LANES,
    _bilinear_base,
    _padded_geom,
    _prep_loads,
    _prep_plane,
    _win_rows,
    pallas_available,
)

_G = 8          # points per grid step
_NSHIFT = 24    # row-shifted plane copies (window row 0 at block top)
_RAWC = 24      # raw ref-window columns carried to the XLA post-pass


def prefetch_available(dtype=jnp.float32) -> bool:
    return pallas_available(dtype)


def supported(psz: int, win: int, dtype=jnp.float32,
              shape: tuple[int, int] | None = None) -> bool:
    """The kernel geometry fixes the shift count at _NSHIFT rows, which
    covers spans up to 16 (the production psz=8/win=16 shape).  When
    ``shape`` (H, W of the level image) is given, also checks that the
    padded plane fits the packed index-word bit fields (10-bit row
    block, 5-bit col block): wider/taller images fall back to the
    shipped kernel instead of silently corrupting addresses."""
    span = max(psz + 3, win)
    if not (prefetch_available(dtype) and _win_rows(span) == _NSHIFT):
        return False
    if shape is not None and not _geom_fits(shape, span):
        return False
    return True


def _geom_fits(shape: tuple[int, int], span: int) -> bool:
    """The plan's planes are the TWO-PHASE stack (2*Hp rows); the packed
    index word gives the row block q = r_ex // _NSHIFT 10 bits and the
    col block 5 bits (ADVICE r4: overflow would corrupt addresses)."""
    Hp, Wp = _padded_geom(shape[0], shape[1], span, True)
    return Wp // _LANES <= 32 and (2 * Hp) // _NSHIFT < 1024


def _shift_stack(plane: jnp.ndarray, wr: int) -> jnp.ndarray:
    """(Hp, Wp) -> (_NSHIFT, H3, Wp) row-shifted copies, H3 % wr == 0.

    Copy s holds ``plane[s:]``; a window starting at plane row r lives
    at block ``(r % _NSHIFT? no - see pack)``: rows are arranged so any
    start row r is block-aligned in copy ``r % wr`` at block ``r // wr``
    (wr == _NSHIFT == 24 here).
    """
    Hp, Wp = plane.shape
    H3 = ((Hp + wr - 1) // wr) * wr
    ext = jnp.pad(plane, ((0, H3 + _NSHIFT - 1 + 8 - Hp), (0, 0)))
    return jnp.stack([ext[s:s + H3] for s in range(_NSHIFT)], axis=0)


def _pack_word(load, wr: int):
    """One int32 per point per plane: copy s (5b) | row block (10b) |
    col block (5b) | lane roll (7b).  Covers images to ~24k padded rows
    and ~4k padded lanes."""
    r_ex = load[0] + load[2]          # exact first row of the window
    s = r_ex % wr
    q = r_ex // wr
    c = load[1] // _LANES
    return s | (q << 5) | (c << 15) | (load[3] << 20)


def _make_kernel(G: int, wr: int, win: int):
    def kern(idx_ref, *refs):
        out_r, out_q = refs[-2:]
        blocks = refs[:-2]
        step = pl.program_id(0)
        for g in range(G):
            i = step * G + g
            w0 = idx_ref[2 * i]
            w1 = idx_ref[2 * i + 1]
            V = blocks[g][0]
            V = pltpu.roll(V, _LANES - ((w0 >> 20) & 127), axis=1)
            out_r[g] = V[:wr, :_RAWC]
            Wq = blocks[G + g][0]
            Wq = pltpu.roll(Wq, _LANES - ((w1 >> 20) & 127), axis=1)
            out_q[g] = Wq[:win, :win]

    return kern


def _plan(ref_img, query_img, centers, origins, psz, padding, win):
    """Host-side plan: shift-stacked planes + packed per-point index
    words + the bilinear bases the post-pass needs.  Pure XLA — shared
    by the kernel path and the CPU emulation test."""
    span = max(psz + 3, win)
    wr = _win_rows(span)
    assert wr == _NSHIFT, (wr, _NSHIFT)
    H, W = ref_img.shape
    two_phase = True  # planes are HBM-resident: two-phase is free
    rplane = _shift_stack(_prep_plane(ref_img, span, two_phase), wr)
    qplane = _shift_stack(_prep_plane(query_img, span, two_phase), wr)

    flatc = centers.reshape(-1, 2)
    M = flatc.shape[0]
    row0, col0, w = _bilinear_base(flatc, psz, padding)
    ref_load = _prep_loads(row0 - 1, col0 - 1, span, H, W, two_phase)
    flato = origins.reshape(-1, 2)
    win_load = _prep_loads(flato[:, 0], flato[:, 1], span, H, W, two_phase)

    G = _G
    M_pad = ((M + G - 1) // G) * G
    idx = jnp.stack([_pack_word(ref_load, wr), _pack_word(win_load, wr)],
                    axis=1).reshape(-1)
    idx = jnp.pad(idx, ((0, 2 * (M_pad - M)),)).astype(jnp.int32)
    return rplane, qplane, idx, row0, col0, w, M, M_pad, wr


def _postpass(raw_r, raw_q, row0, col0, w, centers, origins,
              psz, padding, win, H, W, patch_norm):
    """XLA post-pass: identical formulas/float-op order to the shipped
    kernel (_kernel_grad_window) — bit-exact by construction."""
    M = row0.shape[0]
    wr = raw_r.shape[1]
    q = psz + 1
    raw_r = raw_r[:M]
    Wi = raw_r[:, 1:q + 1, 1:q + 1]
    Wdx = raw_r[:, 1:q + 1, 2:q + 2] - raw_r[:, 1:q + 1, 0:q]
    Wdy = raw_r[:, 2:q + 2, 1:q + 1] - raw_r[:, 0:q, 1:q + 1]
    rows_i = jnp.arange(wr)[None, :, None] + (row0[:, None, None] - 1)
    cols_i = jnp.arange(_RAWC)[None, None, :] + (col0[:, None, None] - 1)
    r0ok = (rows_i >= padding) & (rows_i <= H - padding - 1)
    r1ok = (rows_i >= padding + 1) & (rows_i <= H - padding - 2)
    c0ok = (cols_i >= padding) & (cols_i <= W - padding - 1)
    c1ok = (cols_i >= padding + 1) & (cols_i <= W - padding - 2)
    mdx = jnp.where(r0ok & c1ok, 1.0, 0.0)[:, 1:q + 1, 1:q + 1]
    mdy = jnp.where(r1ok & c0ok, 1.0, 0.0)[:, 1:q + 1, 1:q + 1]
    Wdx = Wdx * mdx
    Wdy = Wdy * mdy
    w = w.astype(jnp.float32)
    w00 = w[:, 0, None, None]
    w01 = w[:, 1, None, None]
    w10 = w[:, 2, None, None]
    w11 = w[:, 3, None, None]

    def tap(Wx):
        return (w00 * Wx[:, 1:psz + 1, 1:psz + 1]
                + w01 * Wx[:, 1:psz + 1, 0:psz]
                + w10 * Wx[:, 0:psz, 1:psz + 1]
                + w11 * Wx[:, 0:psz, 0:psz])

    shp = centers.shape[:-1] + (psz, psz)
    p_img = tap(Wi).reshape(shp)
    p_dx = tap(Wdx).reshape(shp)
    p_dy = tap(Wdy).reshape(shp)
    if patch_norm:
        p_img = p_img - jnp.mean(p_img, axis=(-2, -1), keepdims=True)
    qwin = raw_q[:M].reshape(origins.shape[:-1] + (win, win))
    return p_img, p_dx, p_dy, qwin


@functools.partial(jax.jit, static_argnames=("psz", "padding", "win",
                                             "patch_norm"))
def gather_ref_grad_and_windows_prefetch(
        ref_img: jnp.ndarray, query_img: jnp.ndarray,
        centers: jnp.ndarray, origins: jnp.ndarray,
        psz: int, padding: int, win: int, patch_norm: bool = False):
    """Drop-in twin of patch_pallas.gather_ref_grad_and_windows —
    bit-identical outputs, prefetch-pipelined execution."""
    H, W = ref_img.shape
    rplane, qplane, idx, row0, col0, w, M, M_pad, wr = _plan(
        ref_img, query_img, centers, origins, psz, padding, win)
    G = _G

    in_specs = []
    for wd in (0, 1):
        for g in range(G):
            in_specs.append(pl.BlockSpec(
                (1, wr, _LANES),
                (lambda i, idx_ref, g=g, wd=wd:
                 (idx_ref[2 * (i * G + g) + wd] & 31,
                  (idx_ref[2 * (i * G + g) + wd] >> 5) & 1023,
                  (idx_ref[2 * (i * G + g) + wd] >> 15) & 31)),
                memory_space=pltpu.VMEM))

    raw_r, raw_q = pl.pallas_call(
        _make_kernel(G, wr, win),
        out_shape=(jax.ShapeDtypeStruct((M_pad, wr, _RAWC), jnp.float32),
                   jax.ShapeDtypeStruct((M_pad, win, win), jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M_pad // G,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((G, wr, _RAWC), lambda i, idx_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, win, win), lambda i, idx_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
    )(idx, *([rplane] * G), *([qplane] * G))

    return _postpass(raw_r, raw_q, row0, col0, w, centers, origins,
                     psz, padding, win, H, W, patch_norm)
