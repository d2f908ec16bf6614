import jax
import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.sfm.epipolar import (
    epiline_distance,
    fit_fundamental_ransac,
    fundamental_8pt,
    sampson_distance,
)
from invcompcamtrack_tpu.sfm.stereo import disparity_to_points, stereo_flow_consistency
from invcompcamtrack_tpu.vo.datasets import (
    kitti_gt_centers,
    load_kitti_sequence,
    read_kitti_calib,
)
from invcompcamtrack_tpu.vo.rig import (
    refine_rig_pose,
    rig_camera_poses,
    triangulate_rig_tracks,
)
from tests.oracles import geometry_np as geo


def _two_view(rng, N=60, noise=0.0):
    fc, cc = (400.0, 410.0), (320.0, 240.0)
    p = np.r_[rng.normal(size=3) * 0.4, rng.normal(size=3) * 0.1]
    G = geo.se3_exp(p)
    X = rng.normal(size=(N, 3)) * 2 + [0, 0, 8]
    ua, _ = geo.project(geo.se3_exp(np.zeros(6)), X, *fc, *cc)
    ub, _ = geo.project(G, X, *fc, *cc)
    return ua + rng.normal(size=ua.shape) * noise, ub + rng.normal(size=ub.shape) * noise


def test_fundamental_8pt_epipolar_constraint(rng):
    ua, ub = _two_view(rng)
    F = fundamental_8pt(jnp.asarray(ua), jnp.asarray(ub))
    d = epiline_distance(F, jnp.asarray(ua), jnp.asarray(ub))
    assert float(jnp.max(d)) < 1e-3
    s = sampson_distance(F, jnp.asarray(ua), jnp.asarray(ub))
    assert float(jnp.max(s)) < 1e-5


def test_fundamental_ransac_rejects_dynamic_points(rng):
    ua, ub = _two_view(rng, N=80, noise=0.2)
    ub = ub.copy()
    ub[:20] += rng.uniform(15, 60, size=(20, 2))  # "moving objects"
    res = fit_fundamental_ransac(jax.random.PRNGKey(0), jnp.asarray(ua),
                                 jnp.asarray(ub), n_samples=512, thresh=1.5)
    inl = np.asarray(res.inliers)
    assert inl[20:].mean() > 0.85
    assert inl[:20].mean() < 0.2


def test_disparity_triangulation():
    fx, fy, cx, cy, B = 400.0, 400.0, 320.0, 240.0, 0.5
    uv = jnp.asarray([[320.0, 240.0], [400.0, 240.0]])
    disp = jnp.asarray([10.0, -1.0])
    X = np.asarray(disparity_to_points(uv, disp, fx, fy, cx, cy, B))
    np.testing.assert_allclose(X[0], [0.0, 0.0, 20.0], atol=1e-6)
    assert np.all(np.isnan(X[1]))  # negative disparity


def test_stereo_consistency_gate(rng):
    N = 10
    l0 = rng.uniform(50, 200, (N, 2))
    r0 = l0 - [20, 0]
    l1 = l0 + [3, 1]
    r1 = r0 + [3, 1]
    ok = np.asarray(stereo_flow_consistency(
        jnp.asarray(l0), jnp.asarray(r0), jnp.asarray(l1), jnp.asarray(r1)))
    assert ok.all()
    r1_bad = r1.copy()
    r1_bad[0] += [5, 0]   # loop break
    l0_bad = l0.copy()
    l0_bad[1, 1] += 4.0   # rectification break
    ok2 = np.asarray(stereo_flow_consistency(
        jnp.asarray(l0_bad), jnp.asarray(r0), jnp.asarray(l1), jnp.asarray(r1_bad)))
    assert not ok2[0] and not ok2[1] and ok2[2:].all()


def test_kitti_reader(tmp_path, rng):
    seq = tmp_path / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    (tmp_path / "poses").mkdir()
    P0 = "P0: 718.856 0 607.19 0 0 718.856 185.21 0 0 0 1 0"
    P1 = "P1: 718.856 0 607.19 -386.14 0 718.856 185.21 0 0 0 1 0"
    (seq / "calib.txt").write_text(P0 + "\n" + P1 + "\n")
    (seq / "times.txt").write_text("0.0\n0.1\n0.2\n")
    for i in range(3):
        (seq / "image_0" / f"{i:06d}.png").write_bytes(b"")
        (seq / "image_1" / f"{i:06d}.png").write_bytes(b"")
    poses = np.tile(np.eye(3, 4).reshape(-1), (3, 1))
    poses[:, 3] = [0.0, 1.0, 2.0]
    np.savetxt(tmp_path / "poses" / "00.txt", poses)

    s = load_kitti_sequence(tmp_path, "00")
    assert len(s.image_paths) == 3 and len(s.image_paths_right) == 3
    np.testing.assert_allclose(s.fc, (718.856, 718.856))
    np.testing.assert_allclose(s.baseline, 386.14 / 718.856, rtol=1e-6)
    centers = kitti_gt_centers(s.poses_gt)
    np.testing.assert_allclose(centers[:, 0], [0.0, 1.0, 2.0])


def test_rig_triangulation_and_pose_refinement(rng):
    fc, cc = (300.0, 305.0), (160.0, 120.0)
    C = 4
    # cameras spread around the rig body, small rotations
    extr = []
    for c in range(C):
        pc = np.r_[rng.normal(size=3) * 0.3, rng.normal(size=3) * 0.1]
        extr.append(geo.se3_exp(pc))
    extr = jnp.asarray(np.stack(extr))

    T = 3
    rig_gt = np.stack([np.r_[0.2 * t, 0.01 * t, 0.0, rng.normal(size=3) * 0.01]
                       for t in range(T)])
    L = 40
    X_gt = rng.normal(size=(L, 3)) * 2 + [0, 0, 10]

    obs = np.zeros((L, T, C, 2))
    mask = np.ones((L, T, C), bool)
    for t in range(T):
        G_cams = np.asarray(rig_camera_poses(jnp.asarray(rig_gt[t]), extr))
        for c in range(C):
            uv, Xc = geo.project(G_cams[c], X_gt, *fc, *cc)
            obs[:, t, c] = uv
            # realistic observations: in front of the camera AND inside
            # the image (like the reference's detected tracks)
            mask[:, t, c] = (
                (Xc[:, 2] > 0.5)
                & (uv[:, 0] > 0) & (uv[:, 0] < 320)
                & (uv[:, 1] > 0) & (uv[:, 1] < 240)
            )
    obs = np.where(mask[..., None], obs + rng.normal(size=obs.shape) * 0.1, 0.0)

    X, cov = triangulate_rig_tracks(jnp.asarray(rig_gt), extr,
                                    jnp.asarray(obs), jnp.asarray(mask), fc, cc)
    err = np.linalg.norm(np.asarray(X) - X_gt, axis=1)
    assert np.median(err) < 0.05, np.median(err)  # 0.1px noise, ~0.3-baseline rig at depth 10

    # rig pose refinement from a perturbed start against the GT points
    p0 = jnp.asarray(rig_gt[1] + np.r_[0.05, -0.04, 0.03, 0.01, -0.01, 0.01])
    p_ref, msq = refine_rig_pose(p0, extr, jnp.asarray(X_gt),
                                 jnp.asarray(obs[:, 1]), jnp.asarray(mask[:, 1]),
                                 fc, cc)
    derr = np.abs(np.asarray(p_ref) - rig_gt[1])
    assert derr.max() < 5e-3, derr  # noise-limited (0.1px obs noise)
    assert float(msq) < 0.05


def test_euroc_reader(tmp_path):
    from invcompcamtrack_tpu.vo.datasets import load_euroc_sequence

    cam = tmp_path / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    gt = tmp_path / "mav0" / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    (cam / "data.csv").write_text(
        "#timestamp [ns],filename\n"
        "1403636579763555584,1403636579763555584.png\n"
        "1403636579813555456,1403636579813555456.png\n"
    )
    for n in ("1403636579763555584", "1403636579813555456"):
        (cam / "data" / f"{n}.png").write_bytes(b"")
    (gt / "data.csv").write_text(
        "#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n"
        "1403636579758555392,4.68,-1.78,0.78,0.53,-0.15,-0.82,-0.08\n"
    )
    s = load_euroc_sequence(tmp_path)
    assert len(s.image_paths) == 2
    np.testing.assert_allclose(s.timestamps[0], 1403636579.763555584, rtol=1e-9)
    np.testing.assert_allclose(s.gt_positions[0], [4.68, -1.78, 0.78])
    np.testing.assert_allclose(s.gt_quaternions[0], [0.53, -0.15, -0.82, -0.08])


def test_two_view_initialization(rng):
    """Essential-matrix bootstrap: recover relative pose (up to scale)
    and triangulate seeds from matched normalized points."""
    from invcompcamtrack_tpu.sfm.twoview import initialize_two_view

    p_gt = np.r_[0.3, -0.1, 0.05, 0.02, -0.03, 0.01]
    G = geo.se3_exp(p_gt)
    N = 120
    X = rng.normal(size=(N, 3)) * 2 + [0, 0, 8]
    xn0 = X[:, :2] / X[:, 2:3]
    Xc = X @ G[:, :3].T + G[:, 3]
    xn1 = Xc[:, :2] / Xc[:, 2:3]
    noise = 0.3 / 500.0  # ~0.3px at f=500
    xn0 = xn0 + rng.normal(size=xn0.shape) * noise
    xn1 = xn1 + rng.normal(size=xn1.shape) * noise

    res = initialize_two_view(jax.random.PRNGKey(0), jnp.asarray(xn0),
                              jnp.asarray(xn1), jnp.ones(N, bool))
    assert int(res.num_inliers) > 100
    assert int(res.valid.sum()) > 90
    G_est = geo.se3_exp(np.asarray(res.pose1))
    # rotation must match
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(G_est[:, :3] @ G[:, :3].T) - 1) / 2, -1, 1)))
    assert rot_err < 0.5, rot_err
    # translation direction must match (scale is free)
    t_est = G_est[:, 3] / np.linalg.norm(G_est[:, 3])
    t_gt = G[:, 3] / np.linalg.norm(G[:, 3])
    assert np.dot(t_est, t_gt) > 0.999, np.dot(t_est, t_gt)
    # triangulated landmarks match GT up to the global scale
    lm = np.asarray(res.landmarks)
    v = np.asarray(res.valid)
    scale = np.median(X[v, 2] / lm[v, 2])
    err = np.linalg.norm(lm[v] * scale - X[v], axis=1)
    assert np.median(err) < 0.2, np.median(err)  # noise-limited: ~z^2/(fB) * 0.3px
