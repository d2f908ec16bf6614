import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.match.flow_eval import flow_epe_binned
from invcompcamtrack_tpu.sfm.covariance import cov_ellipse, project_cov_3d_to_2d
from invcompcamtrack_tpu.utils import rotation as rot
from invcompcamtrack_tpu.utils import sensors, splines, viz
from tests.oracles import geometry_np as geo
from tests.oracles import triang_np as tora


# ---------- rotations ----------

def test_quat_dcm_roundtrip(rng):
    for _ in range(20):
        R = geo.se3_exp(np.r_[np.zeros(3), rng.normal(size=3)])[:, :3]
        q = rot.dcm2quat(R)
        assert q[0] >= 0
        np.testing.assert_allclose(rot.quat2dcm(q), R, atol=1e-9)


def test_rodrigues_matches_se3_exp(rng):
    w = rng.normal(size=3)
    np.testing.assert_allclose(
        rot.rodrigues(w), geo.se3_exp(np.r_[np.zeros(3), w])[:, :3], atol=1e-12
    )


def test_android_rotvec_3_and_4_component(rng):
    w = rng.normal(size=3) * 0.2
    q = np.r_[np.cos(np.linalg.norm(w) / 2),
              np.sin(np.linalg.norm(w) / 2) * w / np.linalg.norm(w)]
    R4 = rot.android_rotvec_to_dcm(np.r_[q[1:], q[0]])
    np.testing.assert_allclose(R4, rot.quat2dcm(q), atol=1e-9)
    # 3-component input uses the reference's q0 = 1 - |v|^2 (no sqrt):
    # only approximately equal, exact after SVD orthonormalization
    R3 = rot.android_rotvec_to_dcm(q[1:], orthonormalize=True)
    assert rot.rotation_angle_deg(R3, R4) < 0.05


def test_gyro_integration_constant_rate():
    """Constant z-rate for 1s at 100Hz must yield the analytic rotation."""
    t = np.linspace(0, 1, 101)
    rates = np.tile([0.0, 0.0, 0.5], (101, 1))
    Rs = rot.integrate_gyro(t, rates)
    want = geo.se3_exp(np.r_[np.zeros(3), 0, 0, 0.5])[:, :3]
    assert rot.rotation_angle_deg(Rs[-1], want) < 0.05


def test_interpolate_orientations_endpoint_exact(rng):
    t = np.array([0.0, 1.0, 2.0])
    Rs = np.stack([
        np.eye(3),
        geo.se3_exp(np.r_[np.zeros(3), 0.0, 0.3, 0.0])[:, :3],
        geo.se3_exp(np.r_[np.zeros(3), 0.0, 0.6, 0.0])[:, :3],
    ])
    out = rot.interpolate_orientations(t, Rs, np.array([0.0, 0.5, 2.0]))
    assert rot.rotation_angle_deg(out[0], Rs[0]) < 1e-6
    assert rot.rotation_angle_deg(out[2], Rs[2]) < 1e-6
    mid = geo.se3_exp(np.r_[np.zeros(3), 0.0, 0.15, 0.0])[:, :3]
    assert rot.rotation_angle_deg(out[1], mid) < 0.2


# ---------- splines ----------

def test_smoothing_spline_denoises(rng):
    t = np.linspace(0, 2 * np.pi, 120)
    clean = np.stack([np.sin(t), np.cos(t)], axis=1)
    noisy = clean + rng.normal(size=clean.shape) * 0.15
    # NOTE: the reference's smoother LL = (I + (1/p)K - K)^{-1} smooths
    # MORE as p -> 0; mild-smoothing regime is p near 1
    yhat, _, _ = splines.smoothing_spline(t, noisy, p=0.9)
    assert np.mean((yhat - clean) ** 2) < np.mean((noisy - clean) ** 2) * 0.4


def test_smoothing_spline_p1_interpolates(rng):
    t = np.linspace(0, 1, 30)
    y = rng.normal(size=(30, 1))
    yhat, _, _ = splines.smoothing_spline(t, y, p=1.0)
    np.testing.assert_allclose(yhat, y, atol=1e-8)


def test_smoothing_spline_batch_matches_unbatched(rng):
    t = np.linspace(0, 5, 80)
    y = rng.normal(size=(80, 2))
    full, _, _ = splines.smoothing_spline(t, y, p=1e-2)
    batched = splines.smoothing_spline_batch(t, y, p=1e-2, batchsize=200)
    np.testing.assert_allclose(batched, full, atol=1e-10)


def test_double_integrate_constant_acceleration():
    t = np.linspace(0, 2, 50)
    a = np.full((50, 1), 3.0)
    d = splines.double_integrate(t, a)
    np.testing.assert_allclose(d[:, 0], 1.5 * t**2, atol=1e-6)


def test_crossval_p_prefers_smoothing_for_noisy_data(rng):
    t = np.linspace(0, 2 * np.pi, 60)
    y = np.stack([np.sin(t)], axis=1) + rng.normal(size=(60, 1)) * 0.3
    p = splines.smoothing_spline_crossval_p(t, y, rounds=10, depth_iters=2)
    assert 0 < p < 1.0


# ---------- sensors ----------

def test_csv_parse_and_gps(tmp_path, rng):
    rows = [
        "0.0,4,0.1,0.2,0.3,82,0.01,0.02,0.03",
        "0.1,4,0.1,0.2,0.3,1,47.37,8.54,408.0",
        "0.2,84,0.0,0.0,0.1,83,0.0,0.0,9.81",
        "0.3,4,0.0,0.0,0.0",  # all-zero -> dropped
    ]
    p = tmp_path / "imu.csv"
    p.write_text("\n".join(rows) + "\n")
    s = sensors.parse_imu_gps_csv(p)
    assert s.gyro[0].shape == (2,)  # the all-zero row was dropped
    assert s.linacc[1].shape == (1, 3)
    assert s.gps[1].shape == (1, 3)
    assert s.rotvec[1].shape == (1, 3)
    xyz = sensors.gps_to_cartesian(np.tile([47.37, 8.54, 408.0], (3, 1)))
    np.testing.assert_allclose(xyz, 0.0, atol=1e-6)  # same point -> centered


def test_dead_reckon_constant_acceleration(rng):
    t = np.linspace(0, 1, 50)
    a = np.tile([1.0, 0.0, 0.0], (50, 1))
    streams = sensors.SensorStreams(
        gps=(np.array([]), np.zeros((0, 3))),
        accel=(t, a),
        gyro=(t, np.zeros((50, 3))),
        orient=(np.array([]), np.zeros((0, 3))),
        linacc=(t, a),
        rotvec=(np.array([]), np.zeros((0, 3))),
        gravity=(np.array([]), np.zeros((0, 3))),
    )
    tt, R, disp = sensors.dead_reckon(streams, use_rotvec=False)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(disp[-1, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(disp[-1, 1:], 0.0, atol=1e-8)


# ---------- viz + flow eval ----------

def test_viz_flow_shapes_and_colors():
    u = np.array([[1.0, -1.0], [0.0, 5.0]])
    v = np.zeros((2, 2))
    img = viz.viz_flow(u, v, logscale=False, scaledown=2.0)
    assert img.shape == (2, 2, 3)
    assert img.dtype == np.uint8
    # zero flow renders (near) white
    assert img[1, 0].min() >= 250


def test_flow_epe_binned(rng):
    gt = np.zeros((20, 20, 2))
    gt[:10] = 5.0      # |gt| ~ 7 < 10
    gt[10:] = 30.0     # |gt| ~ 42 >= 40
    est = gt + 1.0     # error sqrt(2) everywhere
    out = flow_epe_binned(jnp.asarray(gt), jnp.asarray(est))
    np.testing.assert_allclose(float(out["all"]), np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(float(out["s<10"]), np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(float(out["s>=40"]), np.sqrt(2), rtol=1e-6)
    assert float(out["s10-40"]) == 0.0  # empty bin -> 0 by max(cnt,1)


# ---------- covariance ----------

def test_cov_projection_matches_monte_carlo(rng):
    """Algebraic 3D->2D covariance propagation vs sampling — the
    reference's validation strategy (determinant ratio ~ 1)."""
    fc, cc = (400.0, 410.0), (320.0, 240.0)
    R = geo.se3_exp(np.r_[np.zeros(3), rng.normal(size=3) * 0.1])[:, :3]
    tw = np.array([0.2, -0.1, -5.0])
    P = tora.projection_matrix(fc, cc, R, tw)
    X = np.array([0.3, -0.2, 3.0])
    cov3 = np.diag([1e-4, 2e-4, 5e-4])

    samples = rng.multivariate_normal(X, cov3, size=20000)
    proj = np.stack([tora.project(P, s) for s in samples])
    cov2_mc = np.cov(proj.T)

    cov2 = np.asarray(project_cov_3d_to_2d(jnp.asarray(cov3), jnp.asarray(X),
                                           jnp.asarray(P)))
    ratio = np.linalg.det(cov2) / np.linalg.det(cov2_mc)
    assert 0.9 < ratio < 1.1, ratio

    w, h, ang = cov_ellipse(jnp.asarray(cov2))
    assert float(w) >= float(h) > 0
