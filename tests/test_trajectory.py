"""Multi-step trajectory refinement with bending-energy smoothing
(sfm/trajectory.py) against a scipy oracle implementing the reference's
exact residual structure (reference:
run_3DPoint_triangulation_error_test.ipynb cell 1)."""

import numpy as np
import jax.numpy as jnp
from scipy import optimize as scop

from invcompcamtrack_tpu.sfm.trajectory import (
    bending_stiffness,
    refine_point_trajectory,
)
from tests.oracles import geometry_np as geo


def _rig(rng, T=7, C=3):
    """T time steps x C cameras looking at a moving point near z=10."""
    fc = np.array([400.0, 410.0])
    cc = np.array([320.0, 240.0])
    R = np.zeros((T, C, 3, 3))
    tw = np.zeros((T, C, 3))
    for t in range(T):
        for j in range(C):
            w = rng.normal(size=3) * 0.05
            R[t, j] = geo.se3_exp(np.r_[np.zeros(3), w])[:, :3]
            tw[t, j] = np.array([2.0 * j - 2.0, 0.1 * t, 0.0]) \
                + rng.normal(size=3) * 0.05
    # smooth trajectory: low-order polynomial in t
    ts = np.linspace(-1, 1, T)[:, None]
    X_gt = (np.array([0.5, -0.3, 10.0])
            + ts * np.array([1.0, 0.6, 0.4])
            + ts**2 * np.array([-0.4, 0.3, 0.2]))
    return fc, cc, R, tw, X_gt


def _project_all(X, R, tw, fc, cc):
    T, C = R.shape[:2]
    obs = np.zeros((T, C, 2))
    for t in range(T):
        for j in range(C):
            Xc = R[t, j] @ (X[t] - tw[t, j])
            obs[t, j] = Xc[:2] / Xc[2] * fc + cc
    return obs


def _oracle_refine(fc, cc, R, tw, obs, X0, sp_weight):
    """The reference's err_functional re-stated in numpy + scipy LM."""
    T, C = R.shape[:2]
    K = np.asarray(bending_stiffness(T, jnp.float64))

    def err(Xin):
        e = np.zeros(2 * T * C + 3)
        Xr = Xin.reshape(T, 3)
        pred = _project_all(Xr, R, tw, fc, cc)
        e[: 2 * T * C] = (pred - obs).reshape(-1)
        if sp_weight is not None:
            bend = np.sum((K @ Xr) * Xr, axis=0)
            e[-3:] = sp_weight * bend
        return e

    return scop.least_squares(err, X0.reshape(-1), method="lm").x.reshape(T, 3)


def test_stiffness_matches_reference_quirks():
    """K rebuilt with the notebook's exact loop must match ours."""
    T = 9
    hi = np.ones(T - 2)
    hi[0] = hi[-1] = 2.0
    delta = np.zeros((T - 2, T))
    W = np.zeros((T - 2, T - 2))
    for i in range(T - 2):
        delta[i, i] = 1 / hi[i]
        delta[i, i + 1] = -2 / hi[i]
        delta[i, i + 2] = 1 / hi[i]
    for i in range(T - 2):
        W[i, i] = 2 * hi[i] / 3
        if i > 0:
            W[i - 1, i] = hi[i] / 6
            W[i, i - 1] = hi[i] / 6
    K_ref = delta.T @ np.linalg.inv(W) @ delta
    np.testing.assert_allclose(np.asarray(bending_stiffness(T)), K_ref,
                               atol=1e-12)


def test_refine_noiseless_recovers_gt(rng):
    fc, cc, R, tw, X_gt = _rig(rng)
    obs = _project_all(X_gt, R, tw, fc, cc)
    X0 = X_gt + rng.normal(size=X_gt.shape) * 0.2
    X = np.asarray(refine_point_trajectory(R, tw, obs, X0, fc, cc,
                                           sp_weight=None))
    np.testing.assert_allclose(X, X_gt, atol=1e-5)


def test_refine_matches_scipy_oracle(rng):
    """Same residual structure as the reference's scipy path — both with
    and without the bending prior."""
    fc, cc, R, tw, X_gt = _rig(rng, T=6)
    obs = _project_all(X_gt, R, tw, fc, cc) + rng.normal(size=(6, 3, 2)) * 0.5
    X0 = X_gt + rng.normal(size=X_gt.shape) * 0.1
    for w in (None, 2.0):
        ours = np.asarray(refine_point_trajectory(
            R, tw, obs, X0, fc, cc, sp_weight=w, num_iters=40))
        oracle = _oracle_refine(fc, cc, R, tw, obs, X0, w)
        np.testing.assert_allclose(ours, oracle, atol=2e-3)


def test_smoothing_prior_reduces_error_monte_carlo(rng):
    """The notebook's empirical claim: with noisy observations, the
    bending-energy prior lowers the trajectory error vs independent
    per-step refinement.  Checked over a Monte-Carlo batch of points
    (run as ONE vmapped device program)."""
    fc, cc, R, tw, X_gt = _rig(rng, T=7, C=2)
    P = 24
    noise = 2.0
    obs = np.stack([
        _project_all(X_gt, R, tw, fc, cc)
        + rng.normal(size=(7, 2, 2)) * noise
        for _ in range(P)
    ])                                            # (P, T, C, 2)
    X0 = np.stack([X_gt + rng.normal(size=X_gt.shape) * 0.3
                   for _ in range(P)])

    X_ind = np.asarray(refine_point_trajectory(
        R, tw, obs, X0, fc, cc, sp_weight=None, num_iters=30))
    X_sm = np.asarray(refine_point_trajectory(
        R, tw, obs, X0, fc, cc, sp_weight=3.0, num_iters=30))

    err_ind = np.linalg.norm(X_ind - X_gt, axis=-1).mean()
    err_sm = np.linalg.norm(X_sm - X_gt, axis=-1).mean()
    assert err_sm < err_ind, (err_sm, err_ind)


def test_refine_masked_observations(rng):
    """Masked-out observations must not affect the solution."""
    fc, cc, R, tw, X_gt = _rig(rng, T=5, C=3)
    obs = _project_all(X_gt, R, tw, fc, cc)
    obs_bad = obs.copy()
    obs_bad[:, 2, :] = 1e6  # garbage in camera 2
    mask = np.ones(obs.shape[:-1], bool)
    mask[:, 2] = False
    X0 = X_gt + rng.normal(size=X_gt.shape) * 0.2
    X = np.asarray(refine_point_trajectory(
        R, tw, obs_bad, X0, fc, cc, obs_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(X, X_gt, atol=1e-5)
