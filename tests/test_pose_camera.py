import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.core import lie, pose
from invcompcamtrack_tpu.core.camera import CameraPyramid, distort, undistort
from tests.oracles import geometry_np as ora


def test_camera_pyramid_scaling():
    cam = CameraPyramid.create((1000.0, 1200.0), (660.0, 390.0), (1280, 720), 5, 8)
    for s in range(5):
        fx, fy, cx, cy, swo, sho = cam.level(s)
        np.testing.assert_allclose(float(fx), 1000.0 * 0.5**s, rtol=1e-6)
        np.testing.assert_allclose(float(fy), 1200.0 * 0.5**s, rtol=1e-6)
        np.testing.assert_allclose(float(cx), 660.0 * 0.5**s, rtol=1e-6)
        np.testing.assert_allclose(float(swo), 1280.0 * 0.5**s, rtol=1e-6)
        np.testing.assert_allclose(float(sho), 720.0 * 0.5**s, rtol=1e-6)


def test_normalize_points_matches_oracle(rng):
    X = rng.normal(size=(100, 3)) * 5 + np.array([10.0, -4.0, 30.0])
    Xn, mean, varval = pose.normalize_points(jnp.asarray(X))
    Xn_o, mean_o, var_o = ora.normalize_points(X)
    np.testing.assert_allclose(np.asarray(mean), mean_o, rtol=1e-12)
    np.testing.assert_allclose(float(varval), var_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Xn), Xn_o, rtol=1e-12)


def test_pose_normalization_roundtrip(rng):
    X = rng.normal(size=(50, 3)) * 3 + 20
    _, mean, varval = ora.normalize_points(X)
    for _ in range(10):
        p = ora.random_pose(rng)
        pn = pose.normalize_pose(jnp.asarray(p), jnp.asarray(mean), jnp.asarray(varval))
        np.testing.assert_allclose(
            np.asarray(pn), ora.normalize_pose(p, mean, varval), rtol=1e-8, atol=1e-10
        )
        back = pose.unnormalize_pose(pn, jnp.asarray(mean), jnp.asarray(varval))
        np.testing.assert_allclose(np.asarray(back), p, rtol=1e-7, atol=1e-9)


def test_normalized_projection_invariance(rng):
    """Projecting normalized points with the normalized pose must give the
    same pixels as the original pair — the core invariant the reference's
    donorm path relies on."""
    X = rng.normal(size=(60, 3)) * 4
    X[:, 2] += 20  # in front of camera
    p = np.zeros(6)
    p[3:] = rng.normal(size=3) * 0.1
    G = ora.se3_exp(p)
    uv0, _ = ora.project(G, X, 1000.0, 1100.0, 640.0, 360.0)

    Xn, mean, varval = ora.normalize_points(X)
    pn = np.asarray(
        pose.normalize_pose(jnp.asarray(p), jnp.asarray(mean), jnp.asarray(varval))
    )
    uv1 = np.asarray(
        pose.project_points(
            lie.se3_exp(jnp.asarray(pn)), jnp.asarray(Xn), 1000.0, 1100.0, 640.0, 360.0
        )
    )
    np.testing.assert_allclose(uv1, uv0, rtol=1e-7, atol=1e-6)


def test_project_save_rotated(rng):
    p = ora.random_pose(rng, wscale=0.2)
    X = rng.normal(size=(30, 3))
    X[:, 2] += 15
    G = lie.se3_exp(jnp.asarray(p))
    uv, Xc = pose.project_points(G, jnp.asarray(X), 500.0, 500.0, 320.0, 240.0, return_cam=True)
    uv_o, Xc_o = ora.project(np.asarray(G), X, 500.0, 500.0, 320.0, 240.0)
    np.testing.assert_allclose(np.asarray(uv), uv_o, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Xc), Xc_o, rtol=1e-10)


def test_frustum_predicate():
    uv = jnp.array([[0.0, 0.0], [-0.001, 5.0], [100.0, 50.0], [100.001, 50.0], [50.0, 51.0]])
    valid = pose.in_frustum(uv, 100.0, 50.0)
    np.testing.assert_array_equal(np.asarray(valid), [True, False, True, False, False])


def test_distort_undistort_inverse_approx(rng):
    kc = jnp.asarray([0.05, -0.01, 0.001, -0.002, 0.0])
    pt = jnp.asarray(rng.uniform(-0.3, 0.3, size=(40, 2)))
    d = distort(pt, kc)
    u = undistort(d, kc)
    # the reference's one-step inverse is approximate
    np.testing.assert_allclose(np.asarray(u), np.asarray(pt), atol=2e-3)


def test_reproject_camcenter_conventions(rng):
    X = rng.normal(size=(10, 3))
    X[:, 2] += 12
    R = ora.se3_exp(np.concatenate([np.zeros(3), rng.normal(size=3) * 0.3]))[:, :3]
    tw = rng.normal(size=3)
    uv_a = pose.reproject(jnp.asarray(X), jnp.asarray(R), jnp.asarray(tw),
                          (800.0, 820.0), (400.0, 300.0))
    Xc = (X - tw) @ R.T
    expect = np.stack([Xc[:, 0] / Xc[:, 2] * 800 + 400, Xc[:, 1] / Xc[:, 2] * 820 + 300], 1)
    np.testing.assert_allclose(np.asarray(uv_a), expect, rtol=1e-9)
