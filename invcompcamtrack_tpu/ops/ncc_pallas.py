"""Fused NCC odometry-verification kernel ("Pallas kernel #2").

The reference's RANSAC verifier scores each inlier point by extracting
three patches — from the OLDEST image at the backward-chained pose, the
reference image at the sample pose, and the NEWEST image at the
forward-chained pose — mean-normalizing, unit-normalizing, and
correlating (back,ref) and (ref,fwd)
(reference: run_track_nposes.cpp:271-352, dopatchnorm forced :281).

The XLA path (match/ncc.py + image/patch.py) runs three separate
gather programs + reduction passes; on TPU each gather lowers to a
per-slice loop (~1.5 us/point, see docs/kernels.md).  This kernel fuses
the whole score: per point it performs the three aligned window loads
(the machinery of ops/patch_pallas.py), the 4-tap bilinear combines,
mean subtraction, norms, and both correlation dots — emitting just two
floats per point.  No (M, psz, psz) intermediates ever exist.

VMEM: all three level planes stay resident; when the three padded
planes exceed the budget (e.g. 3x 1080p), callers fall back to the XLA
path (``ncc3_available``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from invcompcamtrack_tpu.ops.patch_pallas import (
    _T,
    _UNROLL,
    _VMEM_BUDGET,
    _lanes,
    _load_window,
    _padded_geom,
    _prep_indices,
    _prep_plane,
    _tap,
    _use_two_phase,
    pallas_available,
)

_NORM_FLOOR = 1e-15  # match match/ncc.py::NORM_FLOOR

# SMEM windows cost ~256 B/element (128 B x 2 buffering levels) and this
# kernel streams SIX scalar blocks (3 load plans + 3 tap-weight sets);
# at the shared _T=256 that is 1.5 MB against the 1 MB SMEM budget, so
# the point tile is halved here: 6 x (128, 4) x 256 B = 768 KB.
_T_NCC = 128


def ncc3_available(shape, dtype=jnp.float32, psz: int = 8) -> bool:
    """True when the fused kernel applies: TPU f32 and the three padded
    planes (+ two-phase stacks if chosen) fit the VMEM budget."""
    if not pallas_available(dtype):
        return False
    H, W = shape
    span = psz + 1
    two_phase = _use_two_phase(H, W, span, n_planes=3)
    Hp, Wp = _padded_geom(H, W, span, two_phase)
    per_plane = (2 if two_phase else 1) * Hp * Wp * 4
    return 3 * per_plane <= _VMEM_BUDGET


def _kernel_ncc3(psz, lanes, idx_b_ref, w_b_ref, idx_r_ref, w_r_ref,
                 idx_f_ref, w_f_ref, img_b_ref, img_r_ref, img_f_ref,
                 out_ref):
    span = psz + 1

    def one_patch(img_ref, idx_ref, w_ref, i):
        win = _load_window(img_ref, idx_ref, i, span, lanes)
        p = _tap(win, w_ref, i, psz)
        p = p - jnp.mean(p)                       # dopatchnorm (forced)
        n = jnp.sqrt(jnp.sum(p * p))
        return p, jnp.maximum(n, _NORM_FLOOR)

    def body(j, _):
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            pb, nb = one_patch(img_b_ref, idx_b_ref, w_b_ref, i)
            pr, nr = one_patch(img_r_ref, idx_r_ref, w_r_ref, i)
            pf, nf = one_patch(img_f_ref, idx_f_ref, w_f_ref, i)
            cbr = jnp.maximum(0.0, jnp.sum(pb * pr) / (nb * nr))
            crf = jnp.maximum(0.0, jnp.sum(pr * pf) / (nr * nf))
            out_ref[i] = jnp.stack([cbr, crf])
        return 0

    jax.lax.fori_loop(0, _T_NCC // _UNROLL, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("psz", "padding", "interpret"))
def ncc3_scores(img_back: jnp.ndarray, img_ref: jnp.ndarray,
                img_fwd: jnp.ndarray, uv_back: jnp.ndarray,
                uv_ref: jnp.ndarray, uv_fwd: jnp.ndarray,
                psz: int, padding: int, interpret: bool = False):
    """Fused (corr_back_ref, corr_ref_fwd) per point.

    imgs: (Hp, Wp) f32 padded pyramid levels (identical shapes);
    uv_*: (..., 2) pixel centers (finite; clip upstream).
    Returns two (...,)-shaped f32 arrays, exactly matching
    ``ncc_score(extract_patches(..., patch_norm=True), ...)``.
    """
    span = psz + 1
    H, W = img_ref.shape
    two_phase = _use_two_phase(H, W, span, n_planes=3)
    planes = [_prep_plane(im, span, two_phase)
              for im in (img_back, img_ref, img_fwd)]
    Hs, Ws = planes[0].shape

    packs = [_prep_indices(uv, psz, padding, H, W, span, two_phase)
             for uv in (uv_back, uv_ref, uv_fwd)]
    (idx_b, w_b, M, M_pad), (idx_r, w_r, _, _), (idx_f, w_f, _, _) = packs

    smem = lambda: pl.BlockSpec((_T_NCC, 4), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)
    vmem_plane = lambda: pl.BlockSpec((Hs, Ws), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_ncc3, psz, _lanes(two_phase)),
        out_shape=jax.ShapeDtypeStruct((M_pad, 2), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(M_pad // _T_NCC,),  # M_pad is 256-aligned, so also 128
            in_specs=[smem(), smem(), smem(), smem(), smem(), smem(),
                      vmem_plane(), vmem_plane(), vmem_plane()],
            out_specs=pl.BlockSpec((_T_NCC, 2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(idx_b, w_b, idx_r, w_r, idx_f, w_f, *planes)

    shape = uv_ref.shape[:-1]
    return out[:M, 0].reshape(shape), out[:M, 1].reshape(shape)
