"""Multi-step 3D point-trajectory refinement with bending-energy smoothing.

The reference's closest thing to bundle adjustment: a *moving* 3D point
observed over ``T`` time steps by ``C`` cameras per step is refined by
joint nonlinear least squares over all T positions, with reprojection
residuals plus a smoothing-spline bending-energy prior coupling the
steps (behavioral spec: ``func_refine_pt3d_reprojection_sp_smoothing``,
reference: misc_src/run_3DPoint_triangulation_error_test.ipynb cell 1;
driven from run_test_OF_track.py's pipeline).

Semantics pinned to the reference:

- the stiffness matrix K uses the reference's quirky uniform-spacing
  Reinsch construction with END SPACINGS DOUBLED (``hi[0]=hi[-1]=2``)
  and both arms of each second difference divided by the same ``hi[i]``
  (see ``bending_stiffness``),
- the prior contributes THREE residual entries — ``sp_weight`` times the
  per-dimension total bending energy ``diag(X^T K X)`` — appended to the
  2TC reprojection entries,
- ``sp_weight=None`` decouples the steps (independent per-step
  refinement, the reference's default).

TPU-native re-design: the reference loops scipy ``least_squares`` per
point on CPU; here one LM solver (forward-AD Jacobian, damped normal
equations, accept/reject) runs the whole point batch as a single device
program via ``vmap`` — the parameter vector per point is only 3T, so the
normal equations are tiny dense solves batched over points on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import pose as pose_ops

_PREC = jax.lax.Precision.HIGHEST


def bending_stiffness(T: int, dtype=jnp.float64) -> jnp.ndarray:
    """(T, T) bending-energy stiffness K = D^T W^{-1} D with the
    reference's exact quirks (uniform unit spacing, end spacings 2,
    both arms of D divided by the row's own h)."""
    h = jnp.ones((T - 2,), dtype)
    h = h.at[0].set(2.0).at[-1].set(2.0)
    r = jnp.arange(T - 2)
    D = jnp.zeros((T - 2, T), dtype)
    D = D.at[r, r].set(1.0 / h)
    D = D.at[r, r + 1].set(-2.0 / h)
    D = D.at[r, r + 2].set(1.0 / h)
    W = (
        jnp.diag(2.0 * h / 3.0)
        + jnp.diag(h[1:] / 6.0, 1)
        + jnp.diag(h[1:] / 6.0, -1)
    )
    return D.T @ jnp.linalg.solve(W, D)


def _residuals(X, R, tw, obs, obs_mask, fc, cc, K_sm, sp_weight):
    """Residual vector of one trajectory.

    X: (T, 3); R: (T, C, 3, 3); tw: (T, C, 3) world camera centers;
    obs: (T, C, 2).  Returns (2*T*C + 3,).
    """
    T, C = obs.shape[:2]
    proj = pose_ops.reproject(
        X[:, None, None, :], R, tw, fc, cc
    )[..., 0, :]                                   # (T, C, 2)
    r = (proj - obs) * obs_mask[..., None]
    parts = [r.reshape(-1)]
    if sp_weight is not None:
        bend = jnp.sum((K_sm @ X) * X, axis=0)     # diag(X^T K X), (3,)
        parts.append(sp_weight * bend)
    else:
        parts.append(jnp.zeros((3,), X.dtype))
    return jnp.concatenate(parts)


def refine_point_trajectory(R, tw, obs, X0, fc, cc, sp_weight=None,
                            obs_mask=None, num_iters: int = 25,
                            damp_init: float = 1e-4, damp_up: float = 10.0,
                            damp_down: float = 10.0):
    """LM refinement of moving-point trajectories.

    R: (T, C, 3, 3); tw: (T, C, 3); obs: (..., T, C, 2) measured pixels;
    X0: (..., T, 3) initial trajectories (e.g. per-step triangulations).
    Returns the refined (..., T, 3) trajectories.

    Cameras are shared across the point batch (the multi-camera-rig
    shape of the reference workload); observations and initializations
    batch over leading dims.
    """
    R = jnp.asarray(R)
    tw = jnp.asarray(tw)
    obs = jnp.asarray(obs)
    X0 = jnp.asarray(X0, obs.dtype)
    fc = jnp.asarray(fc, obs.dtype)
    cc = jnp.asarray(cc, obs.dtype)
    T = X0.shape[-2]
    if obs_mask is None:
        obs_mask = jnp.ones(obs.shape[:-1], bool)
    K_sm = bending_stiffness(T, obs.dtype)

    def solve_one(x0, o, om):
        def res_fn(xflat):
            return _residuals(xflat.reshape(T, 3), R, tw, o, om, fc, cc,
                              K_sm, sp_weight)

        def step(carry, _):
            x, damp, err = carry
            r = res_fn(x)
            J = jax.jacfwd(res_fn)(x)              # (M, 3T)
            H = J.T @ J
            H = H + damp * jnp.diag(jnp.maximum(jnp.diag(H), 1e-10))
            dx = jnp.linalg.solve(H, -J.T @ r)
            cand = x + dx
            err_new = jnp.sum(res_fn(cand) ** 2)
            ok = err_new < err
            x = jnp.where(ok, cand, x)
            damp = jnp.where(ok, damp / damp_down, damp * damp_up)
            err = jnp.where(ok, err_new, err)
            return (x, damp, err), None

        err0 = jnp.sum(res_fn(x0.reshape(-1)) ** 2)
        (x, _, _), _ = jax.lax.scan(
            step,
            (x0.reshape(-1), jnp.asarray(damp_init, x0.dtype), err0),
            None, length=num_iters,
        )
        return x.reshape(T, 3)

    lead = X0.shape[:-2]
    if not lead:
        return solve_one(X0, obs, obs_mask)
    f = solve_one
    for _ in range(len(lead)):
        f = jax.vmap(f)
    return f(X0, obs, obs_mask)
