import jax.numpy as jnp
import numpy as np
import pytest

from invcompcamtrack_tpu.sfm import triangulate as tr
from tests.oracles import geometry_np as geo
from tests.oracles import triang_np as ora


def _multiview(rng, n_views=4, noise=0.3):
    """GT point + cameras in the reference's P-convention; noisy obs."""
    fc, cc = (500.0, 510.0), (320.0, 240.0)
    X_gt = np.array([1.0, -0.5, 2.0]) + rng.normal(size=3) * 0.3
    P_list, pt2d, Rs, tws = [], [], [], []
    for v in range(n_views):
        # camera centers spread on a ring, looking roughly at the point
        tw = np.array([2.0 * np.cos(v), 2.0 * np.sin(v), -4.0])
        w = rng.normal(size=3) * 0.05
        R = geo.se3_exp(np.concatenate([np.zeros(3), w]))[:, :3]
        P = ora.projection_matrix(fc, cc, R, tw)
        obs = ora.project(P, X_gt) + rng.normal(size=2) * noise
        P_list.append(P)
        pt2d.append(obs)
        Rs.append(R)
        tws.append(tw)
    return X_gt, P_list, np.array(pt2d), Rs, tws


def test_projection_matrix_matches_oracle(rng):
    from invcompcamtrack_tpu.core.pose import projection_matrix

    R = geo.se3_exp(np.concatenate([np.zeros(3), rng.normal(size=3) * 0.2]))[:, :3]
    tw = rng.normal(size=3)
    got = np.asarray(projection_matrix((500.0, 510.0), (320.0, 240.0),
                                       jnp.asarray(R), jnp.asarray(tw)))
    np.testing.assert_allclose(got, ora.projection_matrix((500.0, 510.0), (320.0, 240.0), R, tw),
                               rtol=1e-12)


def test_dlt_matches_oracle_and_gt(rng):
    for _ in range(10):
        X_gt, P_list, pt2d, _, _ = _multiview(rng, noise=0.0)
        X, cov = tr.triangulate_dlt(jnp.asarray(np.stack(P_list)), jnp.asarray(pt2d))
        Xo, covo = ora.dlt(P_list, pt2d)
        np.testing.assert_allclose(np.asarray(X), Xo, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(cov), covo, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(X), X_gt, atol=1e-6)


def test_dlt_batched(rng):
    Ps, obs = [], []
    gts = []
    for _ in range(7):
        X_gt, P_list, pt2d, _, _ = _multiview(rng, noise=0.0)
        Ps.append(np.stack(P_list))
        obs.append(pt2d)
        gts.append(X_gt)
    X, _ = tr.triangulate_dlt(jnp.asarray(np.stack(Ps)), jnp.asarray(np.stack(obs)))
    np.testing.assert_allclose(np.asarray(X), np.stack(gts), atol=1e-6)


def test_gn_matches_numeric_jacobian_oracle(rng):
    for _ in range(5):
        X_gt, P_list, pt2d, _, _ = _multiview(rng, noise=0.5)
        X0 = X_gt + rng.normal(size=3) * 0.2
        X, cov = tr.triangulate_gn(
            jnp.asarray(np.stack(P_list)), jnp.asarray(pt2d), jnp.asarray(X0),
            num_iters=8,
        )
        Xo = ora.gauss_newton(P_list, pt2d, X0, num_iters=8)
        np.testing.assert_allclose(np.asarray(X), Xo, rtol=1e-5, atol=1e-7)


def test_lm_matches_oracle_flow(rng):
    for _ in range(5):
        X_gt, P_list, pt2d, _, _ = _multiview(rng, noise=0.5)
        X0 = X_gt + rng.normal(size=3) * 0.3
        X, _ = tr.triangulate_lm(
            jnp.asarray(np.stack(P_list)), jnp.asarray(pt2d), jnp.asarray(X0),
            num_iters=8,
        )
        Xo = ora.lm(P_list, pt2d, X0, num_iters=8)
        np.testing.assert_allclose(np.asarray(X), Xo, rtol=1e-5, atol=1e-6)


def test_depth_only_matches_oracle(rng):
    for _ in range(5):
        X_gt, P_list, pt2d, Rs, tws = _multiview(rng, noise=0.2)
        campos = np.asarray(tws[0], float)
        d = X_gt - campos
        ptdir = d / np.linalg.norm(d)
        X0 = X_gt + ptdir * 0.4
        X, var = tr.triangulate_depth_only(
            jnp.asarray(np.stack(P_list)), jnp.asarray(pt2d),
            jnp.asarray(campos), jnp.asarray(ptdir), jnp.asarray(X0),
            num_iters=8,
        )
        Xo = ora.depth_only(P_list, pt2d, campos, ptdir, X0, num_iters=8)
        np.testing.assert_allclose(np.asarray(X), Xo, rtol=1e-6, atol=1e-7)
        assert float(var) > 0


def test_chirality_gate(rng):
    X_gt, P_list, pt2d, Rs, tws = _multiview(rng, noise=0.0)
    P = jnp.asarray(np.stack(P_list))
    obs = jnp.asarray(pt2d)
    # healthy case passes
    X, cov = tr.triangulate_dlt(P, obs, R0=jnp.asarray(Rs[0]), c0=jnp.asarray(tws[0]))
    z = Rs[0] @ (np.asarray(X) - tws[0])
    if z[2] >= 0:
        assert np.all(np.isfinite(np.asarray(X)))
    # flipped gate produces NaN
    X2, cov2 = tr.triangulate_dlt(P, obs, R0=jnp.asarray(-Rs[0]), c0=jnp.asarray(tws[0]))
    assert np.all(np.isnan(np.asarray(X2))) != np.all(np.isnan(np.asarray(X)))


def test_view_mask_equivalence(rng):
    """A masked 6-view problem (last 2 masked) must equal the 4-view one."""
    X_gt, P_list, pt2d, _, _ = _multiview(rng, n_views=4, noise=0.1)
    P6 = np.concatenate([np.stack(P_list), np.stack(P_list[:2])], axis=0)
    obs6 = np.concatenate([pt2d, pt2d[:2] + 100.0], axis=0)  # garbage views
    mask = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    X4, _ = tr.triangulate_dlt(jnp.asarray(np.stack(P_list)), jnp.asarray(pt2d))
    X6, _ = tr.triangulate_dlt(jnp.asarray(P6), jnp.asarray(obs6), mask=mask)
    np.testing.assert_allclose(np.asarray(X6), np.asarray(X4), rtol=1e-8)

    X0 = jnp.asarray(X_gt + 0.1)
    Xg4, _ = tr.triangulate_gn(jnp.asarray(np.stack(P_list)), jnp.asarray(pt2d), X0, num_iters=5)
    Xg6, _ = tr.triangulate_gn(jnp.asarray(P6), jnp.asarray(obs6), X0, num_iters=5, mask=mask)
    np.testing.assert_allclose(np.asarray(Xg6), np.asarray(Xg4), rtol=1e-7)
