import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.vo import synthetic
from invcompcamtrack_tpu.vo.engine import VisualOdometry, VOConfig
from invcompcamtrack_tpu.vo.metrics import ate_rmse, rpe_trans, umeyama_align
from tests.oracles import geometry_np as geo


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(30, 3))
    R = geo.se3_exp(np.r_[np.zeros(3), 0.3, -0.2, 0.5])[:, :3]
    s, t = 1.7, np.array([1.0, -2.0, 3.0])
    dst = s * src @ R.T + t
    s2, R2, t2 = umeyama_align(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(float(s2), s, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-8)
    assert float(ate_rmse(jnp.asarray(src), jnp.asarray(dst))) < 1e-8


def _camera_path(rng, n_frames, step=0.015):
    """Gentle forward+lateral motion with small rotations."""
    poses = [np.zeros(6)]
    for i in range(1, n_frames):
        d = np.r_[
            step * 0.5, 0.2 * step * np.sin(i * 0.4), step * 0.2,
            rng.normal(size=3) * 0.002,
        ]
        poses.append(poses[-1] + d)
    return np.stack(poses)


def test_vo_engine_synthetic_sequence(rng):
    """Config-4 style acceptance: full VO loop (track -> keyframe ->
    triangulate -> BA) over a synthetic sequence; ATE must stay tiny."""
    scene = synthetic.make_scene(rng, wh=(256, 192), fc=(240.0, 245.0))
    n_frames = 12
    poses_gt = _camera_path(rng, n_frames)
    imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses_gt]

    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=8, normdp_ratio=0.01)
    cfg = VOConfig(tracker=tracker, max_landmarks=256, window=4,
                   keyframe_stride=2, corners_per_kf=256, min_parallax_px=0.5)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)

    seeds = synthetic.sample_plane_points(scene, rng, 200, margin=24)
    vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)

    for i in range(2, n_frames):
        vo.process_frame(imgs[i])

    traj = np.stack(vo.trajectory)
    centers_gt = np.stack(
        [-geo.se3_exp(p)[:, :3].T @ geo.se3_exp(p)[:, 3] for p in poses_gt]
    )
    assert traj.shape == centers_gt.shape
    ate = float(ate_rmse(jnp.asarray(traj), jnp.asarray(centers_gt),
                         with_scale=False))
    # path length ~ n_frames * step; demand cm-level on an 8-unit-deep scene
    assert ate < 0.01, ate
    rpe = float(rpe_trans(jnp.asarray(traj), jnp.asarray(centers_gt)))
    assert rpe < 0.005, rpe
    # the map must have grown beyond the bootstrap seeds
    assert int(vo.lm_valid.sum()) >= 200


def test_vo_engine_self_initialization(rng):
    """Full GT-free VO: bootstrap from the first two frames (essential
    matrix), then track; ATE (with scale alignment — monocular scale is
    free) must stay small.  Non-planar requirement of the 8-point
    solver is met by using two plane depths... the sinusoid scene is a
    single plane, so seed extra parallax via a strong forward motion."""
    scene = synthetic.make_scene(rng, wh=(256, 192), fc=(240.0, 245.0),
                                 freq_range=(0.8, 8.0))
    n_frames = 8
    poses_gt = [np.zeros(6)]
    for i in range(1, n_frames):
        poses_gt.append(poses_gt[-1] + np.r_[0.02, 0.008, -0.03,
                                             rng.normal(size=3) * 0.001])
    poses_gt = np.stack(poses_gt)
    imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses_gt]

    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=8)
    cfg = VOConfig(tracker=tracker, max_landmarks=256, window=4,
                   keyframe_stride=2, corners_per_kf=256, min_parallax_px=0.5)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
    n_seeds = vo.bootstrap_from_images(imgs[0], imgs[1])
    assert n_seeds > 50, n_seeds
    for i in range(2, n_frames):
        vo.process_frame(imgs[i])

    traj = np.stack(vo.trajectory)
    centers_gt = np.stack(
        [-geo.se3_exp(p)[:, :3].T @ geo.se3_exp(p)[:, 3] for p in poses_gt]
    )
    ate = float(ate_rmse(jnp.asarray(traj), jnp.asarray(centers_gt),
                         with_scale=True))
    # self-initialized, scale-aligned: demand <2% of the path extent
    extent = np.linalg.norm(centers_gt[-1] - centers_gt[0])
    assert ate < 0.05 * extent + 0.01, (ate, extent)
