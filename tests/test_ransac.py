import jax
import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.sfm.pnp import collinearity_degenerate, pnp_dlt
from invcompcamtrack_tpu.sfm.ransac import fit_camera_ransac
from invcompcamtrack_tpu.solver.chain import select_best, track_nposes
from invcompcamtrack_tpu.vo import synthetic
from tests.oracles import geometry_np as geo


def _pose_err(p_a, p_b):
    Ga, Gb = geo.se3_exp(np.asarray(p_a, float)), geo.se3_exp(np.asarray(p_b, float))
    ca = -Ga[:, :3].T @ Ga[:, 3]
    cb = -Gb[:, :3].T @ Gb[:, 3]
    rot = np.degrees(np.arccos(np.clip((np.trace(Ga[:, :3] @ Gb[:, :3].T) - 1) / 2, -1, 1)))
    return np.linalg.norm(ca - cb), rot


def test_pnp_dlt_exact_recovery(rng):
    for _ in range(10):
        p_gt = np.r_[rng.normal(size=3) * 0.5, rng.normal(size=3) * 0.3]
        G_gt = geo.se3_exp(p_gt)
        X = rng.normal(size=(12, 3)) * 2 + [0, 0, 8]
        Xc = X @ G_gt[:, :3].T + G_gt[:, 3]
        xn = Xc[:, :2] / Xc[:, 2:3]
        G, bad = pnp_dlt(jnp.asarray(X), jnp.asarray(xn))
        assert not bool(bad)
        np.testing.assert_allclose(np.asarray(G), G_gt, atol=1e-6)


def test_pnp_dlt_batched(rng):
    Gs, Xs, xns = [], [], []
    for _ in range(16):
        p_gt = np.r_[rng.normal(size=3) * 0.4, rng.normal(size=3) * 0.2]
        G_gt = geo.se3_exp(p_gt)
        X = rng.normal(size=(8, 3)) * 2 + [0, 0, 8]
        Xc = X @ G_gt[:, :3].T + G_gt[:, 3]
        Gs.append(G_gt)
        Xs.append(X)
        xns.append(Xc[:, :2] / Xc[:, 2:3])
    G, bad = pnp_dlt(jnp.asarray(np.stack(Xs)), jnp.asarray(np.stack(xns)))
    assert not np.any(np.asarray(bad))
    np.testing.assert_allclose(np.asarray(G), np.stack(Gs), atol=1e-5)


def test_collinearity_degenerate():
    # collinear 3D points
    X = np.array([[0, 0, 1.0], [0, 0, 2.0], [0, 0, 3.0], [1, 2, 3.0],
                  [4, 5, 6.0], [7, 1, 2.0]])
    x = np.random.default_rng(0).normal(size=(6, 2))
    assert bool(collinearity_degenerate(jnp.asarray(x), jnp.asarray(X)))
    X_ok = np.random.default_rng(1).normal(size=(6, 3))
    assert not bool(collinearity_degenerate(jnp.asarray(x), jnp.asarray(X_ok)))


def test_ransac_finds_pose_with_outliers(rng):
    fc, cc = (500.0, 510.0), (320.0, 240.0)
    p_gt = np.r_[rng.normal(size=3) * 0.3, rng.normal(size=3) * 0.15]
    G_gt = geo.se3_exp(p_gt)
    N = 120
    X = rng.normal(size=(N, 3)) * 2 + [0, 0, 10]
    uv, _ = geo.project(G_gt, X, fc[0], fc[1], cc[0], cc[1])
    uv += rng.normal(size=uv.shape) * 0.3
    # 30% outliers
    n_out = 36
    uv[:n_out] += rng.uniform(30, 120, size=(n_out, 2))

    res = fit_camera_ransac(
        jax.random.PRNGKey(0), jnp.asarray(uv), jnp.asarray(X), fc, cc,
        n_samples=512, inl_thresh=3.0,
    )
    assert int(res.valid.sum()) > 10
    best = int(jnp.argmax(jnp.where(res.valid, res.num_inliers, -1)))
    err_t, err_r = _pose_err(np.asarray(res.poses[best]), p_gt)
    assert err_t < 0.05, err_t
    assert err_r < 0.5, err_r
    # inlier set mostly excludes the outliers
    inl = np.asarray(res.inliers[best])
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.1


def test_track_nposes_scores_good_pose_higher(rng):
    """Two hypotheses — GT pose and a perturbed one — over a 3-frame
    sequence; the odometry-verification score must prefer GT, and the
    full select_best pipeline must pick it (config-3 acceptance)."""
    scene = synthetic.make_scene(rng, wh=(256, 192), fc=(240.0, 245.0))
    cfg = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6, normdp_ratio=0.01)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, cfg.num_levels, cfg.psz)

    # camera path: 3 frames with small motion; reference frame = index 1
    p0 = np.zeros(6)
    p1 = np.r_[rng.normal(size=3) * 0.01, rng.normal(size=3) * 0.005]
    p2 = p1 + np.r_[rng.normal(size=3) * 0.01, rng.normal(size=3) * 0.005]
    pyramids = [
        build_pyramid(jnp.asarray(synthetic.render(scene, geo.se3_exp(p))),
                      cfg.num_levels, cfg.psz)
        for p in (p0, p1, p2)
    ]
    X = synthetic.sample_plane_points(scene, rng, 60, margin=30)

    p_bad = p1 + np.r_[0.08, -0.06, 0.04, 0.01, -0.015, 0.01]
    poses = jnp.asarray(np.stack([p1, p_bad]))
    masks = jnp.ones((2, X.shape[0]), bool)

    res = track_nposes(pyramids, poses, jnp.asarray(X), masks, cam, cfg,
                       fb_frames=(1, 1))
    assert res.pose_tracks.shape == (2, 3, 6)
    mc = np.asarray(res.mean_corr)
    assert mc[0] > mc[1], mc
    assert mc[0] > 0.9, mc

    best, score = select_best(res, jnp.asarray([True, True]))
    assert int(best) == 0

    # the good hypothesis' forward track should be close to the GT pose p2
    err_t, _ = _pose_err(np.asarray(res.pose_tracks[0, 2]), p2)
    assert err_t < 5e-3, err_t


def test_pnp_planar_recovers_pose(rng):
    from invcompcamtrack_tpu.sfm.pnp import planarity, pnp_auto, pnp_planar

    for _ in range(8):
        p_gt = np.r_[rng.normal(size=3) * 0.3, rng.normal(size=3) * 0.2]
        G_gt = geo.se3_exp(p_gt)
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        e1 = np.cross(n, [1.0, 0, 0])
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(n, e1)
        q = rng.normal(size=(8, 2)) * 2
        X = np.array([0, 0, 10.0]) + q[:, 0:1] * e1 + q[:, 1:2] * e2
        Xc = X @ G_gt[:, :3].T + G_gt[:, 3]
        xn = Xc[:, :2] / Xc[:, 2:3]
        G, bad = pnp_planar(jnp.asarray(X), jnp.asarray(xn))
        assert not bool(bad)
        np.testing.assert_allclose(np.asarray(G), G_gt, atol=1e-8)
        # auto-select must route planar samples to the planar solver
        assert float(planarity(jnp.asarray(X))) < 1e-6
        G2, bad2 = pnp_auto(jnp.asarray(X), jnp.asarray(xn))
        np.testing.assert_allclose(np.asarray(G2), G_gt, atol=1e-8)


def test_ransac_on_planar_scene(rng):
    """RANSAC must work when ALL world points are coplanar (roads/walls;
    the general DLT is rank-deficient there)."""
    fc, cc = (300.0, 305.0), (160.0, 120.0)
    p_gt = np.r_[rng.normal(size=3) * 0.1, rng.normal(size=3) * 0.05]
    G_gt = geo.se3_exp(p_gt)
    N = 80
    q = rng.normal(size=(N, 2)) * 2
    X = np.array([0, 0, 8.0]) + np.c_[q, np.zeros(N)]
    uv, _ = geo.project(G_gt, X, fc[0], fc[1], cc[0], cc[1])
    uv += rng.normal(size=uv.shape) * 0.2
    uv[:16] += 60.0  # outliers
    res = fit_camera_ransac(
        jax.random.PRNGKey(1), jnp.asarray(uv), jnp.asarray(X), fc, cc,
        n_samples=256, inl_thresh=2.0,
    )
    assert int(res.valid.sum()) > 30
    best = int(jnp.argmax(jnp.where(res.valid, res.num_inliers, -1)))
    err_t, err_r = _pose_err(np.asarray(res.poses[best]), p_gt)
    assert err_t < 0.05, err_t
    assert err_r < 0.5, err_r
