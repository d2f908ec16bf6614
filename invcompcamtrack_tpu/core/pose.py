"""Pose state transforms: normalization, projection, reprojection.

Semantics follow the reference's ``PoseClass`` exactly (they must, for
trajectory parity):

- A pose is se(3) coefficients ``p = [t, w]`` whose exp is ``[R | t_cam]``
  with ``x_cam = R X + t_cam`` and world camera center ``c = -R^T t_cam``.
- *Normalization* (``donorm``) re-expresses the pose w.r.t. a zero-mean,
  variance-scaled point cloud: ``c' = (c - mean) / varval`` where varval is
  the **mean squared distance itself, not its sqrt** (reference:
  pose.cpp:25-76, odometer.cpp:184-226 — this quirk is kept deliberately).
- Projection is plain pinhole per scale (reference: pose.cpp:307-397).

All functions are batched over arbitrary leading dims and contain no
Python control flow on traced values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie

# Geometry matmuls must stay full f32 on TPU (no bf16 MXU demotion).
_PREC = jax.lax.Precision.HIGHEST


def normalize_points(X: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Zero-mean + variance-scale a point cloud.

    X: (..., N, 3)  ->  (Xn, mean, varval) with
    ``varval = mean_i ||X_i - mean||^2`` and ``Xn = (X - mean)/varval``
    (divide by varval, NOT sqrt(varval): reference odometer.cpp:184-226).

    An optional boolean ``mask`` (..., N) restricts the statistics to the
    selected points (the fixed-shape equivalent of the reference's
    per-sample inlier gather, run_track_nposes.cpp:207-213); masked-out
    rows are still normalized with the selected statistics.
    """
    if mask is None:
        mean = jnp.mean(X, axis=-2, keepdims=True)
        centered = X - mean
        varval = jnp.mean(jnp.sum(centered * centered, axis=-1), axis=-1)
    else:
        m = mask[..., None].astype(X.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(X * m, axis=-2, keepdims=True) / cnt
        centered = X - mean
        varval = (
            jnp.sum(jnp.sum(centered * centered, axis=-1) * m[..., 0], axis=-1)
            / cnt[..., 0, 0]
        )
    Xn = centered / varval[..., None, None]
    return Xn, mean[..., 0, :], varval


def normalize_pose(p: jnp.ndarray, mean: jnp.ndarray, varval: jnp.ndarray) -> jnp.ndarray:
    """Re-express pose w.r.t. normalized cloud (reference: pose.cpp:25-76).

    c = -R^T t; c' = (c - mean)/varval; t' = -R c'; p' = log([R | t']).
    """
    G = lie.se3_exp(p)
    R = G[..., :3]
    c = lie.camera_center(G)
    c = (c - mean) / varval[..., None]
    t = -jnp.einsum("...ij,...j->...i", R, c, precision=_PREC)
    return lie.se3_log(jnp.concatenate([R, t[..., None]], axis=-1))


def unnormalize_pose(p: jnp.ndarray, mean: jnp.ndarray, varval: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`normalize_pose` (reference: pose.cpp:79-113)."""
    G = lie.se3_exp(p)
    R = G[..., :3]
    c = lie.camera_center(G)
    c = c * varval[..., None] + mean
    t = -jnp.einsum("...ij,...j->...i", R, c, precision=_PREC)
    return lie.se3_log(jnp.concatenate([R, t[..., None]], axis=-1))


def transform_points(G: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """x_cam = R X + t.  G: (..., 3, 4), X: (..., N, 3) -> (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", G[..., :3], X, precision=_PREC) + G[..., None, :, 3]


def project_points(
    G: jnp.ndarray, X: jnp.ndarray, fx, fy, cx, cy, return_cam: bool = False
):
    """Batched pinhole projection (reference: pose.cpp:307-488).

    G: (..., 3, 4); X: (..., N, 3); intrinsics are scalars or broadcastable.
    Returns (..., N, 2) pixel coords, and optionally the camera-frame
    points (the reference's ``project_pt_save_rotated``, needed for the
    IC-GN Jacobians).
    """
    Xc = transform_points(G, X)
    z = Xc[..., 2]
    u = (Xc[..., 0] / z) * fx + cx
    v = (Xc[..., 1] / z) * fy + cy
    uv = jnp.stack([u, v], axis=-1)
    if return_cam:
        return uv, Xc
    return uv


def in_frustum(uv: jnp.ndarray, swo, sho) -> jnp.ndarray:
    """Reference frustum predicate: invalid iff x<0 | y<0 | x>swo | y>sho
    (reference: odometer.cpp:273-276; border-inclusive)."""
    x, y = uv[..., 0], uv[..., 1]
    return (x >= 0) & (y >= 0) & (x <= swo) & (y <= sho)


def reproject(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, fc, cc, kc=None,
              camcenter: bool = False) -> jnp.ndarray:
    """The python-layer reprojection entry point with optional distortion
    (reference: func_util_geom.py:519-536).

    camcenter=False: x_cam = R (X - t)   [t = world camera center]
    camcenter=True:  x_cam = R X - t
    """
    from invcompcamtrack_tpu.core.camera import distort

    if camcenter:
        Xc = jnp.einsum("...ij,...nj->...ni", R, X, precision=_PREC) - t[..., None, :]
    else:
        Xc = jnp.einsum("...ij,...nj->...ni", R, X - t[..., None, :], precision=_PREC)
    pn = Xc[..., 0:2] / Xc[..., 2:3]
    if kc is not None:
        pn = distort(pn, jnp.asarray(kc))
    fc = jnp.asarray(fc)
    cc = jnp.asarray(cc)
    return pn * fc + cc


def projection_matrix(fc, cc, R: jnp.ndarray, tw: jnp.ndarray) -> jnp.ndarray:
    """P = K [-R | R tw] — the reference python layer's (sign-flipped)
    projection-matrix convention used by the triangulation stack
    (reference: func_util_geom.py:538-545).  tw is the world camera center.
    """
    fc = jnp.asarray(fc, R.dtype)
    cc = jnp.asarray(cc, R.dtype)
    K = jnp.zeros(R.shape[:-2] + (3, 3), dtype=R.dtype)
    K = K.at[..., 0, 0].set(fc[..., 0])
    K = K.at[..., 1, 1].set(fc[..., 1])
    K = K.at[..., 0, 2].set(cc[..., 0])
    K = K.at[..., 1, 2].set(cc[..., 1])
    K = K.at[..., 2, 2].set(1.0)
    Rt = jnp.einsum("...ij,...j->...i", R, tw, precision=_PREC)
    P = jnp.concatenate([-R, Rt[..., None]], axis=-1)
    return jnp.matmul(K, P, precision=_PREC)
