"""Batched multi-view triangulation: DLT, Gauss-Newton, LM, depth-only.

TPU re-design of the reference's C triangulation kernel
(reference: misc_src/triang.c) and its numpy twin
(reference: misc_src/func_util_geom.py:547-750).  The C code processes
one point over V views with pointer loops; here everything is batched
over an arbitrary leading point dimension and V is a static (masked)
view axis, so thousands of tracks triangulate as one device program.

Conventions (kept bit-faithful to the reference):

- projection matrices use the reference python layer's sign convention
  ``P = K [-R | R t_w]`` (see ``core.pose.projection_matrix``),
- residuals are ``observed - projected``, mean-squared over ``2 V``
  (reference: triang.c:9-32),
- DLT solves the inhomogeneous normal equations with ``(A^T A)^{-1}`` as
  the covariance estimate and a chirality NaN-out
  (reference: triang.c:262-322, func_util_geom.py:565-579),
- LM damping multiplies the *diagonal* of J^T J by (1 + damp), steps are
  re-taken once with increased damping when the residual does not drop
  (reference: triang.c:327-373),
- depth-only GN optimizes distance along the first view's ray
  (reference: triang.c:378-435).

A per-view boolean ``mask`` (optional) supports variable-length tracks in
fixed-shape batches — masked views contribute zero residual/Jacobian.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _hom(X):
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def project_P(P: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """P: (..., V, 3, 4); X: (..., 3) -> (..., V, 2) pixel coords."""
    ph = jnp.einsum("...vij,...j->...vi", P, _hom(X), precision=_PREC)
    return ph[..., :2] / ph[..., 2:3]


def residuals(P, pt2d, X, mask=None):
    """(res, res_msq): res = observed - projected, masked views zeroed;
    res_msq = sum(res^2) / (2 V_total) with V_total the *static* view
    count, matching triang.c:31 (which divides by 2*noviews regardless)."""
    res = pt2d - project_P(P, X)
    if mask is not None:
        res = res * mask[..., None]
    V = res.shape[-2]
    res_msq = jnp.sum(res * res, axis=(-2, -1)) / (2.0 * V)
    return res, res_msq


def sym3x3_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a symmetric 3x3 via cofactors
    (reference: triang.c:135-148).  Batched."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
    i00 = f * d - e * e
    i01 = c * e - f * b
    i02 = b * e - c * d
    i11 = f * a - c * c
    i12 = b * c - a * e
    i22 = a * d - b * b
    det = a * i00 + b * i01 + c * i02
    inv = jnp.stack(
        [
            jnp.stack([i00, i01, i02], axis=-1),
            jnp.stack([i01, i11, i12], axis=-1),
            jnp.stack([i02, i12, i22], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def _proj_jacobian(P, X):
    """d(projection)/dX: (..., V, 2, 3) (reference: triang.c:38-72 —
    the standard (P0j D - P2j N)/D^2 quotient-rule form)."""
    Xh = _hom(X)
    n0 = jnp.einsum("...vj,...j->...v", P[..., 0, :], Xh, precision=_PREC)
    n1 = jnp.einsum("...vj,...j->...v", P[..., 1, :], Xh, precision=_PREC)
    d = jnp.einsum("...vj,...j->...v", P[..., 2, :], Xh, precision=_PREC)
    dsq = d * d
    j0 = (P[..., 0, :3] * d[..., None] - P[..., 2, :3] * n0[..., None]) / dsq[..., None]
    j1 = (P[..., 1, :3] * d[..., None] - P[..., 2, :3] * n1[..., None]) / dsq[..., None]
    return jnp.stack([j0, j1], axis=-2)


def triangulate_dlt(P, pt2d, R0=None, c0=None, mask=None):
    """Linear triangulation via inhomogeneous DLT normal equations.

    P: (..., V, 3, 4); pt2d: (..., V, 2).  Returns (X, cov) with
    cov = (A^T A)^{-1}.  If (R0, c0) — rotation and world center of the
    first view — are given, applies the reference's chirality gate:
    points with ``(R0 (X - c0))_z < 0`` become NaN
    (reference: func_util_geom.py:575-579).
    """
    # A rows per view: [x P2 - P0 ; y P2 - P1]  (reference: triang.c:279-287)
    a_x = pt2d[..., 0:1] * P[..., 2, :] - P[..., 0, :]
    a_y = pt2d[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    A = jnp.stack([a_x, a_y], axis=-2)  # (..., V, 2, 4)
    if mask is not None:
        A = A * mask[..., None, None]
    A = A.reshape(A.shape[:-3] + (-1, 4))
    AtA = jnp.einsum("...ki,...kj->...ij", A[..., :3], A[..., :3], precision=_PREC)
    rhs = -jnp.einsum("...ki,...k->...i", A[..., :3], A[..., 3], precision=_PREC)
    cov = sym3x3_inverse(AtA)
    X = jnp.einsum("...ij,...j->...i", cov, rhs, precision=_PREC)
    if R0 is not None and c0 is not None:
        z = jnp.einsum("...j,...j->...", R0[..., 2, :], X - c0, precision=_PREC)
        bad = z < 0
        X = jnp.where(bad[..., None], jnp.nan, X)
        cov = jnp.where(bad[..., None, None], jnp.nan, cov)
    return X, cov


def triangulate_gn(P, pt2d, X0, num_iters: int = 10, minres: float = 0.0,
                   mask=None):
    """Gauss-Newton refinement of full 3D position
    (reference: triang.c:193-238).  Fixed-trip scan with a convergence
    mask (iterations freeze once res_msq <= minres), so it batches and
    jits cleanly.  Returns (X, cov=(J^T J)^{-1} at the last active step).
    """

    def step(carry, _):
        X, cov_prev, active = carry
        res, res_msq = residuals(P, pt2d, X, mask)
        J = _proj_jacobian(P, X)
        if mask is not None:
            J = J * mask[..., None, None]
        Jf = J.reshape(J.shape[:-3] + (-1, 3))
        rf = res.reshape(res.shape[:-2] + (-1,))
        JtJ = jnp.einsum("...ki,...kj->...ij", Jf, Jf, precision=_PREC)
        cov = sym3x3_inverse(JtJ)
        g = jnp.einsum("...ki,...k->...i", Jf, rf, precision=_PREC)
        delta = jnp.einsum("...ij,...j->...i", cov, g, precision=_PREC)
        act = active & (res_msq > minres)
        X_new = jnp.where(act[..., None], X + delta, X)
        cov_new = jnp.where(act[..., None, None], cov, cov_prev)
        return (X_new, cov_new, act), None

    cov0 = jnp.broadcast_to(jnp.eye(3, dtype=X0.dtype), X0.shape + (3,))
    active0 = jnp.ones(X0.shape[:-1], bool)
    (X, cov, _), _ = jax.lax.scan(step, (X0, cov0, active0), None, length=num_iters)
    return X, cov


def triangulate_lm(P, pt2d, X0, num_iters: int = 10, damp_init: float = 2.0,
                   damp_fct: float = 10.0, minres: float = 1e-5,
                   maxdamp: float = 1e10, mask=None):
    """Levenberg-Marquardt refinement with the reference's exact
    accept/reject flow (reference: triang.c:327-373):

    per iteration: take a damped step; if the residual dropped by more
    than ``minres`` accept it and divide damp by ``damp_fct``; otherwise
    multiply damp by ``damp_fct`` and take (and keep) a fresh step from
    the pre-step point.  Iterations freeze when ``res_msq <= minres`` or
    ``damp >= maxdamp``.
    """

    def lm_step(X, res_flat, JtJ, Jf, damp):
        # damp the diagonal: A = JtJ + damp * diag(JtJ)  (triang.c:242-245)
        diag = jnp.eye(3, dtype=X.dtype) * jnp.diagonal(
            JtJ, axis1=-2, axis2=-1
        )[..., None, :]
        A = JtJ + damp[..., None, None] * diag
        Ainv = sym3x3_inverse(A)
        g = jnp.einsum("...ki,...k->...i", Jf, res_flat, precision=_PREC)
        delta = jnp.einsum("...ij,...j->...i", Ainv, g, precision=_PREC)
        X_new = X + delta
        _, msq = residuals(P, pt2d, X_new, mask)
        return X_new, msq, Ainv

    def step(carry, _):
        X, cov_prev, damp, res_old, active = carry
        res, _ = residuals(P, pt2d, X, mask)
        J = _proj_jacobian(P, X)
        if mask is not None:
            J = J * mask[..., None, None]
        Jf = J.reshape(J.shape[:-3] + (-1, 3))
        rf = res.reshape(res.shape[:-2] + (-1,))
        JtJ = jnp.einsum("...ki,...kj->...ij", Jf, Jf, precision=_PREC)

        X_try, msq_try, cov_try = lm_step(X, rf, JtJ, Jf, damp)
        improved = msq_try < (res_old - minres)
        damp_up = damp * damp_fct
        X_retry, msq_retry, cov_retry = lm_step(X, rf, JtJ, Jf, damp_up)

        X_new = jnp.where(improved[..., None], X_try, X_retry)
        msq_new = jnp.where(improved, msq_try, msq_retry)
        cov_new = jnp.where(improved[..., None, None], cov_try, cov_retry)
        damp_new = jnp.where(improved, damp / damp_fct, damp_up)

        X_out = jnp.where(active[..., None], X_new, X)
        cov_out = jnp.where(active[..., None, None], cov_new, cov_prev)
        damp_out = jnp.where(active, damp_new, damp)
        res_out = jnp.where(active, msq_new, res_old)
        act_next = active & (res_out > minres) & (damp_out < maxdamp)
        return (X_out, cov_out, damp_out, res_out, act_next), None

    _, res0 = residuals(P, pt2d, X0, mask)
    cov0 = jnp.broadcast_to(jnp.eye(3, dtype=X0.dtype), X0.shape + (3,))
    damp0 = jnp.full(X0.shape[:-1], damp_init, X0.dtype)
    active0 = (res0 > minres)
    (X, cov, _, _, _), _ = jax.lax.scan(
        step, (X0, cov0, damp0, res0, active0), None, length=num_iters
    )
    return X, cov


def triangulate_depth_only(P, pt2d, campos, ptdir, X0, num_iters: int = 10,
                           minres: float = 0.0, mask=None):
    """Gauss-Newton on depth along the first view's ray
    (reference: triang.c:378-435).

    campos: (..., 3) first-view world center; ptdir: (..., 3) unit ray.
    X0 initializes the depth as ||X0 - campos||.  Returns (X, depth_var)
    where depth_var = 1 / (J^T J) is the reference's scalar covariance.
    """
    depth0 = jnp.linalg.norm(X0 - campos, axis=-1)

    # depth-independent pieces (reference: triang.c:80-110)
    ch = _hom(campos)
    d1 = jnp.einsum("...vj,...j->...v", P[..., 2, :], ch, precision=_PREC)
    d2 = jnp.einsum("...vj,...j->...v", P[..., 2, :3], ptdir, precision=_PREC)
    aa = jnp.einsum("...vij,...j->...vi", P[..., :2, :3], ptdir, precision=_PREC)
    bb = jnp.einsum("...vij,...j->...vi", P[..., :2, :], ch, precision=_PREC)
    nom = aa * d1[..., None] - bb * d2[..., None]  # (..., V, 2)

    def step(carry, _):
        depth, var_prev, active = carry
        X = campos + ptdir * depth[..., None]
        res, res_msq = residuals(P, pt2d, X, mask)
        denom = (d2 * depth[..., None] + d1) ** 2
        jac = nom / denom[..., None]  # (..., V, 2)
        if mask is not None:
            jac = jac * mask[..., None]
        jtj = jnp.sum(jac * jac, axis=(-2, -1))
        var = 1.0 / jtj
        delta = var * jnp.sum(jac * res, axis=(-2, -1))
        act = active & (res_msq > minres)
        depth_new = jnp.where(act, depth + delta, depth)
        var_new = jnp.where(act, var, var_prev)
        return (depth_new, var_new, act), None

    var0 = jnp.zeros_like(depth0)
    active0 = jnp.ones(depth0.shape, bool)
    (depth, var, _), _ = jax.lax.scan(
        step, (depth0, var0, active0), None, length=num_iters
    )
    return campos + ptdir * depth[..., None], var
