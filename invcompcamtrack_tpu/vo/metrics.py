"""Trajectory evaluation: ATE / RPE with Umeyama alignment.

The reference evaluates trajectories by plotting per-frame camera-center
errors against ground truth (reference: run_odometer_test.m:248-250) and
records "global translation error" logs (reference:
misc_src/pose_tracking_acc.txt).  Here the standard ATE-RMSE / RPE
metrics (Sturm et al., the KITTI/EuRoC convention) are provided as jnp
programs, with closed-form Umeyama similarity alignment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def umeyama_align(src: jnp.ndarray, dst: jnp.ndarray, with_scale: bool = True):
    """Least-squares similarity transform mapping src -> dst.

    src/dst: (N, 3).  Returns (s, R, t) with dst ~ s R src + t.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    cs = src - mu_s
    cd = dst - mu_d
    cov = jnp.matmul(cd.T, cs, precision=_PREC) / src.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = jnp.matmul(U, jnp.matmul(S, Vt, precision=_PREC), precision=_PREC)
    var_s = jnp.mean(jnp.sum(cs * cs, axis=1))
    if with_scale:
        s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-20)
    else:
        s = jnp.asarray(1.0, src.dtype)
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(centers_est: jnp.ndarray, centers_gt: jnp.ndarray,
             align: bool = True, with_scale: bool = True):
    """Absolute trajectory error (RMSE over camera centers).

    Monocular VO has a free global scale, so ``with_scale=True`` is the
    meaningful default for KITTI-style monocular evaluation.
    """
    if align:
        s, R, t = umeyama_align(centers_est, centers_gt, with_scale)
        est = s * jnp.einsum("ij,nj->ni", R, centers_est, precision=_PREC) + t
    else:
        est = centers_est
    err = est - centers_gt
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=1)))


def rpe_trans(centers_est: jnp.ndarray, centers_gt: jnp.ndarray, delta: int = 1):
    """Relative pose (translation) error over frame gaps of ``delta``."""
    de = centers_est[delta:] - centers_est[:-delta]
    dg = centers_gt[delta:] - centers_gt[:-delta]
    err = jnp.linalg.norm(de - dg, axis=1)
    return jnp.sqrt(jnp.mean(err * err))


def rpe_rot(R_est: jnp.ndarray, R_gt: jnp.ndarray, delta: int = 1):
    """Relative rotation error (RMS geodesic angle, radians) over frame
    gaps of ``delta``.  R_est/R_gt: (N, 3, 3) world->cam rotations."""
    dRe = jnp.einsum("nij,nkj->nik", R_est[delta:], R_est[:-delta],
                     precision=_PREC)
    dRg = jnp.einsum("nij,nkj->nik", R_gt[delta:], R_gt[:-delta],
                     precision=_PREC)
    E = jnp.einsum("nij,nkj->nik", dRe, dRg, precision=_PREC)
    tr = jnp.trace(E, axis1=-2, axis2=-1)
    ang = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    return jnp.sqrt(jnp.mean(ang * ang))
