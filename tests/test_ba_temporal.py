"""Temporal (keyframe-axis sharded) BA — ba/temporal.py.

Validates the SP/CP strategy of SURVEY §2.4: sharding the pose axis
must reproduce the single-device window solver, stay invariant to the
shard count (the psum/halo plumbing), and the odometry-chain factors
(ring halo exchange) must anchor poses the reprojection term cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from invcompcamtrack_tpu.ba.temporal import (
    TemporalBAProblem,
    temporal_ba_solve,
)
from invcompcamtrack_tpu.ba.window import ba_residuals, ba_solve
from tests.oracles import geometry_np as geo
from tests.test_ba import _make_problem


def _seq_mesh(n):
    if len(jax.devices()) < n:
        pytest.skip("needs virtual devices")
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


def _to_temporal(prob, odom=None, odom_weight=0.0):
    K = prob.poses.shape[0]
    if odom is None:
        odom = jnp.zeros((K, 6), prob.poses.dtype)
    return TemporalBAProblem(
        poses=prob.poses, landmarks=prob.landmarks, obs=prob.obs,
        mask=prob.mask, fx=prob.fx, fy=prob.fy, cx=prob.cx, cy=prob.cy,
        fixed_pose_mask=prob.fixed_pose_mask,
        odom=odom, odom_weight=jnp.asarray(odom_weight),
    )


def test_temporal_matches_window_solver(rng):
    """With the chain disabled, the K-sharded solver must track the
    single-device CG window solver (same damping schedule)."""
    prob, poses_gt, X_gt = _make_problem(rng, K=8, L=64, noise=0.2,
                                         perturb_pose=0.02, perturb_lm=0.08)
    mesh = _seq_mesh(4)
    p_ref, l_ref, (err_ref, err0_ref) = ba_solve(
        prob, num_iters=10, reduced_solver="cg", cg_iters=48)
    p_t, l_t, (err_t, err0_t) = temporal_ba_solve(
        _to_temporal(prob), mesh, num_iters=10, cg_iters=48)

    np.testing.assert_allclose(float(err0_t), float(err0_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_t), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(l_t), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-6)
    assert float(err_t) < float(err0_t) * 1e-2


@pytest.mark.parametrize("n_seq", [1, 2, 8])
def test_temporal_shard_count_invariance(rng, n_seq):
    """The answer must not depend on how many devices the keyframe axis
    is cut across (psum + boundary halos are exact)."""
    prob, _, _ = _make_problem(rng, K=8, L=48, noise=0.1)
    odom = jnp.asarray(rng.normal(size=(8, 6)) * 0.01)
    t = _to_temporal(prob, odom=odom, odom_weight=5.0)
    mesh1 = _seq_mesh(max(n_seq, 1))
    p1, l1, (e1, _) = temporal_ba_solve(t, mesh1, num_iters=6, cg_iters=40)
    mesh4 = _seq_mesh(4)
    p4, l4, (e4, _) = temporal_ba_solve(t, mesh4, num_iters=6, cg_iters=40)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p4),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l4),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(e1), float(e4), rtol=1e-7)


def test_chain_prior_anchors_blind_pose(rng):
    """A pose with NO observations is invisible to reprojection BA; the
    odometry chain (exact relative poses from GT) must pull it to the
    chain-consistent location — including across a shard boundary
    (K=8 over 4 devices puts pose 3 and 4 on different shards)."""
    prob, poses_gt, _ = _make_problem(rng, K=8, L=64, noise=0.0,
                                      perturb_pose=0.05, perturb_lm=0.0)
    blind = 4  # first row of shard 2 -> its chain factor crosses shards
    mask = np.array(prob.mask)
    mask[blind, :] = False
    prob = prob._replace(mask=jnp.asarray(mask))
    odom_gt = jnp.asarray(np.diff(poses_gt, axis=0))
    odom = jnp.concatenate([odom_gt, jnp.zeros((1, 6))], axis=0)
    mesh = _seq_mesh(4)

    # without the chain the blind pose cannot move off its perturbation
    p_no, _, _ = temporal_ba_solve(_to_temporal(prob), mesh,
                                   num_iters=8, cg_iters=48)
    err_no = float(np.linalg.norm(np.asarray(p_no)[blind] - poses_gt[blind]))

    p_ch, _, _ = temporal_ba_solve(
        _to_temporal(prob, odom=odom, odom_weight=100.0), mesh,
        num_iters=8, cg_iters=48)
    err_ch = float(np.linalg.norm(np.asarray(p_ch)[blind] - poses_gt[blind]))

    assert err_no > 0.02, "blind pose unexpectedly moved without the chain"
    assert err_ch < err_no * 0.05, (err_no, err_ch)
    # the observed poses still converge to GT
    seen = [k for k in range(8) if k != blind]
    np.testing.assert_allclose(np.asarray(p_ch)[seen], poses_gt[seen],
                               atol=1e-3)


def test_temporal_fixed_poses_do_not_move(rng):
    prob, _, _ = _make_problem(rng, K=8, L=48, noise=0.2)
    t = _to_temporal(prob, odom_weight=2.0)
    mesh = _seq_mesh(4)
    p, _, _ = temporal_ba_solve(t, mesh, num_iters=5, cg_iters=32)
    np.testing.assert_array_equal(
        np.asarray(p)[np.asarray(prob.fixed_pose_mask)],
        np.asarray(prob.poses)[np.asarray(prob.fixed_pose_mask)])


def test_temporal_long_window_converges(rng):
    """K=32 over 8 devices — the long-context shape the dense window
    solver cannot reach; error must drop by orders of magnitude."""
    prob, poses_gt, X_gt = _make_problem(rng, K=32, L=96, noise=0.0,
                                         perturb_pose=0.02, perturb_lm=0.05)
    odom = jnp.asarray(
        np.concatenate([np.diff(poses_gt, axis=0), np.zeros((1, 6))], axis=0))
    mesh = _seq_mesh(8)
    _, err0 = ba_residuals(prob)
    p, l, (err, _) = temporal_ba_solve(
        _to_temporal(prob, odom=odom, odom_weight=1.0), mesh,
        num_iters=12, cg_iters=64)
    assert float(err) < float(err0) * 1e-4, (float(err0), float(err))
    np.testing.assert_allclose(np.asarray(p), poses_gt, atol=5e-3)
