"""Massively-parallel RANSAC camera-pose fitting.

TPU re-design of the reference's MATLAB RANSAC driver
(reference: func_ransac_fitcameras_odom.m:29-87).  The reference draws
hypotheses sequentially in a while-loop with retries; here the whole
hypothesis pool is one batched program:

- draw ``n_samples`` index sets at once (jax.random, no replacement),
- vectorized collinearity degeneracy test (reference: :175-194),
- batched linear PnP (``pnp_dlt``; replaces ASPnP),
- reprojection-error inliers against ALL correspondences with the
  distorted model (reference: :47-54), ``min_inliers`` gate
  (reference: :50, :83-87 — inlier count must exceed 4).

Invalid hypotheses keep their slot with ``valid=False`` — fixed shapes,
no compaction.  The final model selection happens downstream by
odometry verification (solver/chain.py), matching the reference's
"highest mean patch correlation wins" rule (reference: :151-154).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core.camera import distort, undistort
from invcompcamtrack_tpu.sfm.pnp import collinearity_degenerate, pnp_auto

_PREC = jax.lax.Precision.HIGHEST


class RansacResult(NamedTuple):
    poses: jnp.ndarray     # (S, 6) se(3) coefficients of [R|t]
    G: jnp.ndarray         # (S, 3, 4)
    inliers: jnp.ndarray   # (S, N) bool
    num_inliers: jnp.ndarray  # (S,)
    valid: jnp.ndarray     # (S,) hypothesis survived all gates


def reprojection_errors(G, Xw, pt2d, fc, cc, kc=None):
    """Pixel reprojection error of [R|t] against observations, with the
    reference's distortion model applied to the projections
    (reference: func_ransac_fitcameras_odom.m:47-49)."""
    Xc = jnp.einsum("...ij,...nj->...ni", G[..., :3], Xw, precision=_PREC) + G[..., None, :, 3]
    pn = Xc[..., 0:2] / Xc[..., 2:3]
    if kc is not None:
        pn = distort(pn, jnp.asarray(kc))
    fc = jnp.asarray(fc)
    cc = jnp.asarray(cc)
    proj = pn * fc + cc
    return jnp.linalg.norm(proj - pt2d, axis=-1)


def fit_camera_ransac(key, pt2d: jnp.ndarray, pt3d: jnp.ndarray, fc, cc,
                      kc=None, n_samples: int = 256, sample_size: int = 6,
                      inl_thresh: float = 10.0, min_inliers: int = 5) -> RansacResult:
    """pt2d: (N, 2) pixel observations; pt3d: (N, 3) world points.

    Returns S = n_samples hypotheses (poses as [R|t] with the same
    convention as the tracker).  ``sample_size`` >= 6 for the linear PnP
    (the reference used 4 + ASPnP; see sfm/pnp.py docstring).
    """
    N = pt2d.shape[0]
    fc = jnp.asarray(fc)
    cc = jnp.asarray(cc)

    # undistort once for the solver, keep raw points for inlier scoring
    # (reference: func_ransac_fitcameras_odom.m:22-25, :47)
    pn = (pt2d - cc) / fc
    if kc is not None:
        pn = undistort(pn, jnp.asarray(kc))

    keys = jax.random.split(key, n_samples)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(sample_size,), replace=False)
    )(keys)  # (S, n)

    samp3d = jnp.take(pt3d, idx, axis=0)   # (S, n, 3)
    samp2n = jnp.take(pn, idx, axis=0)     # (S, n, 2)
    samp2d = jnp.take(pt2d, idx, axis=0)

    degen = collinearity_degenerate(samp2d, samp3d)
    G, pnp_bad = pnp_auto(samp3d, samp2n)

    err = reprojection_errors(G, pt3d, pt2d, fc, cc, kc)
    inl = err <= inl_thresh

    # least-squares refit on each hypothesis' inlier set (weighted PnP
    # over the full correspondence set) — polishes the minimal-sample
    # estimate before odometry verification
    w = inl.astype(G.dtype)
    Xb = jnp.broadcast_to(pt3d, (n_samples,) + pt3d.shape)
    pnb = jnp.broadcast_to(pn, (n_samples,) + pn.shape)
    G_refit, refit_bad = pnp_auto(Xb, pnb, weights=w)
    err_refit = reprojection_errors(G_refit, pt3d, pt2d, fc, cc, kc)
    better = (jnp.sum(err_refit <= inl_thresh, -1) >= jnp.sum(inl, -1)) & (~refit_bad)
    G = jnp.where(better[..., None, None], G_refit, G)
    err = jnp.where(better[..., None], err_refit, err)
    inl = err <= inl_thresh
    cnt = jnp.sum(inl, axis=-1)
    valid = (~degen) & (~pnp_bad) & (cnt >= min_inliers) & jnp.all(
        jnp.isfinite(G.reshape(G.shape[0], -1)), axis=-1
    )
    poses = lie.se3_log(G)
    return RansacResult(poses=poses, G=G, inliers=inl, num_inliers=cnt, valid=valid)
