"""Fundamental-matrix estimation + epipolar utilities.

The reference relies on cv2.findFundamentalMat + RANSAC to split static
from dynamic tracks in the stereo/KITTI workload (reference:
run_test_OF_track.py:309-343) and scores points by epiline distance
(reference: func_F_transfer_points, func_util_geom.py:52-55).  Here the
normalized 8-point solver runs as a batched hypothesis pool — the same
massively-parallel RANSAC shape as the PnP fitter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _normalize_pts(x: jnp.ndarray, weights=None):
    """Hartley normalization: zero mean, mean distance sqrt(2)."""
    if weights is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        d = jnp.linalg.norm(x - mean, axis=-1)
        scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d, axis=-1), 1e-12)
    else:
        w = weights[..., None]
        wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
        mean = jnp.sum(x * w, axis=-2, keepdims=True) / wsum
        d = jnp.linalg.norm(x - mean, axis=-1) * weights
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sum(d, axis=-1) / wsum[..., 0, 0], 1e-12
        )
    T = jnp.zeros(x.shape[:-2] + (3, 3), x.dtype)
    T = T.at[..., 0, 0].set(scale)
    T = T.at[..., 1, 1].set(scale)
    T = T.at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set(-scale * mean[..., 0, 0])
    T = T.at[..., 1, 2].set(-scale * mean[..., 0, 1])
    xn = (x - mean) * scale[..., None, None]
    return xn, T


def fundamental_8pt(xa: jnp.ndarray, xb: jnp.ndarray,
                    weights=None) -> jnp.ndarray:
    """Normalized 8-point algorithm; xa, xb: (..., n>=8, 2) -> (..., 3, 3)
    with rank-2 enforcement.  Optional per-point weights (e.g. an inlier
    mask) give the least-squares refit variant."""
    xan, Ta = _normalize_pts(xa, weights)
    xbn, Tb = _normalize_pts(xb, weights)
    u, v = xan[..., 0], xan[..., 1]
    up, vp = xbn[..., 0], xbn[..., 1]
    ones = jnp.ones_like(u)
    # rows: [u'u, u'v, u', v'u, v'v, v', u, v, 1] for x'^T F x = 0
    A = jnp.stack([up * u, up * v, up, vp * u, vp * v, vp, u, v, ones], axis=-1)
    if weights is not None:
        A = A * weights[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A, precision=_PREC)
    _, evecs = jnp.linalg.eigh(AtA)
    F = evecs[..., :, 0].reshape(evecs.shape[:-2] + (3, 3))
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = jnp.einsum("...ij,...j,...jk->...ik", U, S, Vt, precision=_PREC)
    # denormalize: F = Tb^T F Ta
    F = jnp.einsum("...ji,...jk,...kl->...il", Tb, F, Ta, precision=_PREC)
    return F / jnp.maximum(jnp.abs(F[..., 2:3, 2:3]), 1e-12)


def epiline_distance(F: jnp.ndarray, xa: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Normalized distance of xb to the epiline of xa
    (|l . xb'| with the line normalized like cv2.computeCorrespondEpilines;
    reference: func_util_geom.py:52-55)."""
    xah = jnp.concatenate([xa, jnp.ones_like(xa[..., :1])], axis=-1)
    l = jnp.einsum("...ij,...nj->...ni", F, xah, precision=_PREC)
    norm = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    l = l / jnp.maximum(norm, 1e-12)[..., None]
    return jnp.abs(
        l[..., 0] * xb[..., 0] + l[..., 1] * xb[..., 1] + l[..., 2]
    )


def sampson_distance(F, xa, xb):
    xah = jnp.concatenate([xa, jnp.ones_like(xa[..., :1])], axis=-1)
    xbh = jnp.concatenate([xb, jnp.ones_like(xb[..., :1])], axis=-1)
    Fx = jnp.einsum("...ij,...nj->...ni", F, xah, precision=_PREC)
    Ftx = jnp.einsum("...ji,...nj->...ni", F, xbh, precision=_PREC)
    num = jnp.einsum("...ni,...ni->...n", xbh, Fx, precision=_PREC) ** 2
    den = Fx[..., 0] ** 2 + Fx[..., 1] ** 2 + Ftx[..., 0] ** 2 + Ftx[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


class FRansacResult(NamedTuple):
    F: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    best: jnp.ndarray


def fit_fundamental_ransac(key, xa: jnp.ndarray, xb: jnp.ndarray,
                           n_samples: int = 256, thresh: float = 1.0) -> FRansacResult:
    """Batched F-RANSAC over 8-point samples; inliers by epiline distance
    (the reference's static/dynamic splitter, run_test_OF_track.py:309-343).
    Returns the best model and its inlier mask."""
    N = xa.shape[0]
    keys = jax.random.split(key, n_samples)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(8,), replace=False)
    )(keys)
    Fs = fundamental_8pt(jnp.take(xa, idx, axis=0), jnp.take(xb, idx, axis=0))
    d = epiline_distance(Fs, jnp.broadcast_to(xa, (n_samples,) + xa.shape),
                         jnp.broadcast_to(xb, (n_samples,) + xb.shape))
    inl = d <= thresh
    cnt = jnp.sum(inl, axis=-1)
    best = jnp.argmax(cnt)
    return FRansacResult(F=Fs[best], inliers=inl[best], num_inliers=cnt[best],
                         best=best)
