import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invcompcamtrack_tpu.ba.distributed import ba_solve_sharded
from invcompcamtrack_tpu.ba.window import ba_solve
from invcompcamtrack_tpu.parallel.mesh import make_mesh
from tests.test_ba import _make_problem


@pytest.mark.parametrize("n_model", [2, 4, 8])
def test_sharded_ba_matches_single_device(rng, n_model):
    """The landmark-sharded Schur BA must produce (numerically) the same
    trajectory as the single-device solver on an 8-CPU mesh."""
    if len(jax.devices()) < n_model:
        pytest.skip("needs virtual devices")
    prob, poses_gt, X_gt = _make_problem(rng, K=5, L=64, noise=0.2,
                                         perturb_pose=0.02, perturb_lm=0.08)
    mesh = make_mesh(n_data=len(jax.devices()) // n_model, n_model=n_model)

    p_ref, l_ref, (err_ref, err0_ref) = ba_solve(prob, num_iters=10)
    p_sh, l_sh, (err_sh, err0_sh) = ba_solve_sharded(prob, mesh, num_iters=10)

    np.testing.assert_allclose(float(err0_sh), float(err0_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_ref), rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(float(err_sh), float(err_ref), rtol=1e-8)


def test_sharded_ba_under_jit(rng):
    prob, _, _ = _make_problem(rng, K=4, L=32)
    mesh = make_mesh(n_data=1, n_model=8)
    fn = jax.jit(lambda pr: ba_solve_sharded(pr, mesh, num_iters=5))
    poses, lms, (err, err0) = fn(prob)
    assert float(err) < float(err0)
    assert np.all(np.isfinite(np.asarray(poses)))


def test_sharded_ba_cg_matches_dense(rng):
    """Distributed CG (one (K,6) psum per matvec) must match the dense
    sharded solve."""
    prob, _, _ = _make_problem(rng, K=6, L=64, noise=0.1,
                               perturb_pose=0.02, perturb_lm=0.08)
    mesh = make_mesh(n_data=1, n_model=8)
    p_d, l_d, (e_d, _) = ba_solve_sharded(prob, mesh, num_iters=6)
    p_c, l_c, (e_c, _) = ba_solve_sharded(prob, mesh, num_iters=6,
                                          reduced_solver="cg", cg_iters=60)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_d),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(e_c), float(e_d), rtol=1e-5)


def test_sharded_ba_bench_shapes(rng):
    """Dryrun-scale shapes on the CPU mesh: K=16 window, L=1024 sharded
    landmarks, CG reduced solve — compiles, runs, reduces error."""
    prob, _, _ = _make_problem(rng, K=16, L=1024, noise=0.2,
                               perturb_pose=0.02, perturb_lm=0.1, drop=0.4)
    mesh = make_mesh(n_data=1, n_model=8)
    fn = jax.jit(lambda pr: ba_solve_sharded(pr, mesh, num_iters=4,
                                             reduced_solver="cg",
                                             cg_iters=40,
                                             huber_delta=2.0))
    poses, lms, (err, err0) = fn(prob)
    assert float(err) < float(err0)
    assert np.all(np.isfinite(np.asarray(poses)))
