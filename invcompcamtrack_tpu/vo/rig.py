"""Multi-camera rig triangulation + rig pose tracking.

TPU re-design of the reference's 12-camera van-rig workload
(reference: run_GeoAutomation_triangulation_test.py.ipynb: per-camera
track undistortion (cell 4), active-track N-view triangulation (cell 6),
rig pose tracking by LM over quaternion+translation against triangulated
points (cell 10)).

A rig is a set of C cameras with fixed extrinsics relative to the rig
body: cam_c = extr_c . rig  (both [R|t] world->frame).  Landmarks are
triangulated across cameras AND rig poses with the masked multi-view
machinery (sfm/triangulate), and the rig pose is refined by damped GN
over se(3) with AD Jacobians — the LM-over-quaternion of the reference
re-parametrized to the framework's native se(3) coefficients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.sfm.triangulate import (
    sym3x3_inverse,
    triangulate_dlt,
    triangulate_gn,
)

_PREC = jax.lax.Precision.HIGHEST


def rig_camera_poses(rig_pose: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """rig_pose: (6,) se3; extrinsics: (C, 3, 4) cam-from-rig.
    Returns (C, 3, 4) cam-from-world."""
    G_rig = lie.se3_exp(rig_pose)
    return jax.vmap(lambda E: lie.se3_compose(E, G_rig))(extrinsics)


def rig_projection_matrices(rig_pose, extrinsics, fc, cc):
    """(C, 3, 4) P-matrices in the triangulation convention."""
    from invcompcamtrack_tpu.core.pose import projection_matrix

    G = rig_camera_poses(rig_pose, extrinsics)
    R = G[..., :3]
    c = jax.vmap(lie.camera_center)(G)
    return jax.vmap(lambda Rb, cb: projection_matrix(fc, cc, Rb, cb))(R, c)


def triangulate_rig_tracks(rig_poses: jnp.ndarray, extrinsics: jnp.ndarray,
                           obs: jnp.ndarray, mask: jnp.ndarray, fc, cc,
                           refine_iters: int = 4):
    """N-view triangulation of tracks observed across rig poses+cameras.

    rig_poses: (T, 6); extrinsics: (C, 3, 4);
    obs: (L, T, C, 2) pixel observations; mask: (L, T, C).
    Returns (X (L, 3), cov (L, 3, 3)).
    """
    T, C = rig_poses.shape[0], extrinsics.shape[0]
    P = jax.vmap(lambda p: rig_projection_matrices(p, extrinsics, fc, cc))(
        rig_poses
    )  # (T, C, 3, 4)
    P_flat = P.reshape(T * C, 3, 4)
    L = obs.shape[0]
    P_b = jnp.broadcast_to(P_flat, (L, T * C, 3, 4))
    obs_f = obs.reshape(L, T * C, 2)
    m = mask.reshape(L, T * C).astype(obs.dtype)
    X0, cov = triangulate_dlt(P_b, obs_f, mask=m)
    X0 = jnp.nan_to_num(X0)
    X, cov = triangulate_gn(P_b, obs_f, X0, num_iters=refine_iters, mask=m)
    return X, cov


def refine_rig_pose(rig_pose0: jnp.ndarray, extrinsics: jnp.ndarray,
                    X: jnp.ndarray, obs: jnp.ndarray, mask: jnp.ndarray,
                    fc, cc, num_iters: int = 8, damp: float = 1e-4):
    """Refine one rig pose against known 3D points (the reference's
    cell-10 LM).  X: (L, 3); obs: (L, C, 2); mask: (L, C).
    Returns (pose (6,), final mean-squared residual)."""
    fc = jnp.asarray(fc)
    cc = jnp.asarray(cc)

    def residuals(p):
        G = rig_camera_poses(p, extrinsics)            # (C, 3, 4)
        Xc = jnp.einsum("cij,lj->lci", G[..., :3], X, precision=_PREC) + G[None, :, :, 3]
        # masked points may sit at z ~ 0: guard the division BEFORE the
        # mask multiply (inf * 0 = NaN)
        z = jnp.where(mask, Xc[..., 2], 1.0)
        pn = Xc[..., :2] / z[..., None]
        proj = pn * fc + cc
        r = (obs - proj) * mask[..., None]
        return r.reshape(-1)

    def step(carry, _):
        p, _ = carry
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)                   # (2LC, 6)
        H = jnp.einsum("ki,kj->ij", J, J, precision=_PREC)
        H = H + damp * jnp.eye(6, dtype=p.dtype) * jnp.maximum(
            jnp.diagonal(H), 1e-9
        )
        g = jnp.einsum("ki,k->i", J, r, precision=_PREC)
        # J is the jacobian of the RESIDUAL (obs - proj), so the GN step
        # is p - H^{-1} J^T r
        delta = jnp.linalg.solve(H, g)
        p_new = p - delta
        msq = jnp.mean(residuals(p_new) ** 2)
        return (p_new, msq), None

    (p, msq), _ = jax.lax.scan(
        step, (rig_pose0, jnp.asarray(jnp.inf, rig_pose0.dtype)), None,
        length=num_iters,
    )
    return p, msq
