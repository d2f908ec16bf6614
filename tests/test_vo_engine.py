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


def test_rpe_rot_identity_and_known_angle(rng):
    from invcompcamtrack_tpu.vo.metrics import rpe_rot

    n = 6
    Rg = np.stack([geo.se3_exp(np.r_[np.zeros(3), rng.normal(size=3) * 0.1])[:, :3]
                   for _ in range(n)])
    assert float(rpe_rot(jnp.asarray(Rg), jnp.asarray(Rg))) < 1e-7
    # perturb every OTHER frame by a fixed 0.05 rad z-rotation: each
    # frame gap's relative rotation is off by exactly 0.05
    dR = geo.se3_exp(np.r_[np.zeros(3), 0.0, 0.0, 0.05])[:, :3]
    Re = Rg.copy()
    Re[1::2] = np.einsum("ij,njk->nik", dR, Rg[1::2])
    err = float(rpe_rot(jnp.asarray(Re), jnp.asarray(Rg)))
    np.testing.assert_allclose(err, 0.05, rtol=1e-5)


def test_corridor_scene_photoconsistency(rng):
    """The multi-depth corridor fixture must render photoconsistently:
    a surface point's intensity in a second view equals the texture at
    the point (away from occlusion boundaries), and sampled points have
    genuine depth variation."""
    sc = synthetic.make_corridor(rng, wh=(256, 192), fc=(210.0, 212.0))
    X = synthetic.sample_corridor_points(sc, rng, 200)
    assert X[:, 2].max() - X[:, 2].min() > 5.0, "no depth variation"

    p1 = np.r_[0.08, -0.04, 0.25, 0.01, -0.015, 0.004]
    G1 = geo.se3_exp(p1)
    img1 = synthetic.render_corridor(sc, G1)
    c1 = -G1[:, :3].T @ G1[:, 3]
    # keep points that remain the nearest hit from camera 1 (visible)
    lam1, k1, _ = synthetic._corridor_hits(sc, c1, X - c1)
    Xc = (G1[:, :3] @ X.T + G1[:, 3:]).T
    u = Xc[:, 0] / Xc[:, 2] * sc.fc[0] + sc.cc[0]
    v = Xc[:, 1] / Xc[:, 2] * sc.fc[1] + sc.cc[1]
    vis = (np.abs(lam1 - 1.0) < 1e-6) & (u > 2) & (u < 253) & (v > 2) & (v < 189)
    assert vis.sum() > 100

    # bilinear sample of the rendered view
    u0, v0 = np.floor(u[vis]).astype(int), np.floor(v[vis]).astype(int)
    au, av = u[vis] - u0, v[vis] - v0
    samp = ((1 - au) * (1 - av) * img1[v0, u0] + au * (1 - av) * img1[v0, u0 + 1]
            + (1 - au) * av * img1[v0 + 1, u0] + au * av * img1[v0 + 1, u0 + 1])
    # direct texture evaluation on each point's plane
    _, k, _ = synthetic._corridor_hits(sc, np.zeros(3), X)
    s = np.einsum("ni,ni->n", X, sc.e1[k])
    t = np.einsum("ni,ni->n", X, sc.e2[k])
    tex = 128.0 + sum(
        sc.tex_amps[k, w] * np.sin(sc.tex_freqs[k, w, 0] * s
                                   + sc.tex_freqs[k, w, 1] * t
                                   + sc.tex_phases[k, w])
        for w in range(sc.tex_freqs.shape[1]))
    err = np.abs(samp - tex[vis])
    # bilinear resampling error dominates; occluded points were excluded
    assert np.median(err) < 2.0, np.median(err)


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


def _small_setup(rng, n_frames, wh=(192, 144), fc=(170.0, 172.0), path=None,
                 max_landmarks=128, window=4, freq_range=(2.0, 20.0)):
    scene = synthetic.make_scene(rng, wh=wh, fc=fc, freq_range=freq_range)
    poses_gt = path if path is not None else _camera_path(rng, n_frames)
    imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses_gt]
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cfg = VOConfig(tracker=tracker, max_landmarks=max_landmarks, window=window,
                   keyframe_stride=2, corners_per_kf=128, min_parallax_px=0.5)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
    return scene, poses_gt, imgs, vo


def test_vo_run_frames_matches_process_frame(rng):
    """The single-dispatch chunked scan must produce the same trajectory
    as the per-frame dispatch path."""
    n_frames = 10
    scene, poses_gt, imgs, vo_a = _small_setup(rng, n_frames)
    _, _, _, vo_b = _small_setup(np.random.default_rng(0), n_frames)

    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo_a.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    vo_b.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)

    poses_a = [vo_a.process_frame(imgs[i]) for i in range(2, n_frames)]
    poses_b = vo_b.run_frames(np.stack(imgs[2:n_frames]))
    np.testing.assert_allclose(np.stack(poses_a), poses_b, atol=1e-5)
    np.testing.assert_allclose(np.stack(vo_a.trajectory),
                               np.stack(vo_b.trajectory), atol=1e-5)


def test_vo_observations_are_measurements(rng):
    """Keyframe observations must be MEASURED positions (LK localization
    of the landmark patch), not reprojections of the current state:
    close to the GT projection, but not bit-identical to the state's own
    reprojection."""
    n_frames = 8
    scene, poses_gt, imgs, vo = _small_setup(rng, n_frames)
    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    for i in range(2, n_frames):
        vo.process_frame(imgs[i])

    import jax.numpy as jnp
    from invcompcamtrack_tpu.core import lie, pose as pose_ops

    st = vo.state
    slot = int(st.kf_ptr)
    obs = np.asarray(st.kf_obs[slot])
    msk = np.asarray(st.kf_obs_mask[slot] & st.lm_valid)
    assert msk.sum() > 30
    fx, fy, cx, cy, _, _ = vo.cam.level(0)
    G = lie.se3_exp(st.kf_poses[slot])
    reproj = np.asarray(pose_ops.project_points(
        G, st.landmarks, fx, fy, cx, cy))
    d = np.linalg.norm((obs - reproj)[msk], axis=1)
    # measurements sit near the model but are not the model itself
    assert np.median(d) < 1.5, np.median(d)
    assert np.max(d) > 1e-4, "observations are exact reprojections"


def test_vo_ba_resists_observation_outliers(rng):
    """Corrupt a fraction of the measured observations in the window:
    the Huber-weighted BA keyframe step must still track accurately."""
    n_frames = 10
    scene, poses_gt, imgs, vo = _small_setup(rng, n_frames)
    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    for i in range(2, 6):
        vo.process_frame(imgs[i])

    # inject gross outliers into 10% of the recorded observations
    import jax.numpy as jnp
    obs = np.asarray(vo.state.kf_obs).copy()
    msk = np.asarray(vo.state.kf_obs_mask)
    hit = (np.random.default_rng(1).uniform(size=msk.shape) < 0.1) & msk
    obs[hit] += 50.0
    vo.state = vo.state._replace(kf_obs=jnp.asarray(obs))

    for i in range(6, n_frames):
        vo.process_frame(imgs[i])

    traj = np.stack(vo.trajectory)
    centers_gt = np.stack(
        [-geo.se3_exp(p)[:, :3].T @ geo.se3_exp(p)[:, 3] for p in poses_gt]
    )
    ate = float(ate_rmse(jnp.asarray(traj), jnp.asarray(centers_gt),
                         with_scale=False))
    assert ate < 0.02, ate


def test_vo_landmark_lifecycle_turnover(rng):
    """Long sequence with sustained motion: landmarks that leave view or
    fail re-observation must be retired and their slots re-seeded, so
    the map keeps turning over instead of freezing at capacity."""
    n_frames = 40
    path = [np.zeros(6)]
    for i in range(1, n_frames):
        # steady lateral drift slides the visible set across the scene
        path.append(path[-1] + np.r_[0.18, 0.0, 0.005, 0.0, 0.002, 0.0])
    path = np.stack(path)
    scene, poses_gt, imgs, vo = _small_setup(
        rng, n_frames, path=path, max_landmarks=96, freq_range=(0.5, 6.0))
    seeds = synthetic.sample_plane_points(scene, rng, 90, margin=20)
    vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)

    valid0 = np.asarray(vo.lm_valid).copy()
    lms0 = np.asarray(vo.landmarks).copy()
    for i in range(2, n_frames):
        vo.process_frame(imgs[i])
    valid1 = np.asarray(vo.lm_valid)
    lms1 = np.asarray(vo.landmarks)

    # turnover = slots whose original landmark was retired (still
    # invalid, or re-seeded with a far-away replacement — BA refinement
    # moves a surviving landmark far less than half a world unit)
    moved = np.linalg.norm(lms1 - lms0, axis=1) > 0.5
    turned_over = int(np.sum(valid0 & (~valid1 | moved)))
    assert turned_over > 10, f"only {turned_over} slots turned over"
    # ... and the map stayed healthy on the freed capacity
    assert int(valid1.sum()) > 30, int(valid1.sum())


def test_vo_engine_landmark_sharded_ba_parity(rng):
    """The engine's mesh-sharded window BA (VOConfig.ba_mesh — the
    landmark axis of every keyframe's BA runs shard_map'd over 4 CPU
    devices with psum'd pose reductions) must reproduce the
    single-device trajectory to float tolerance."""
    import jax
    from jax.sharding import Mesh

    n_frames = 10
    scene, poses_gt, imgs, vo_a = _small_setup(rng, n_frames)
    _, _, _, _ = scene, poses_gt, imgs, vo_a

    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), axis_names=("model",))
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cfg_sh = VOConfig(tracker=tracker, max_landmarks=128, window=4,
                      keyframe_stride=2, corners_per_kf=128,
                      min_parallax_px=0.5, ba_mesh=mesh)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    vo_b = VisualOdometry(cam, scene.fc, scene.cc, cfg_sh)

    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo_a.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    vo_b.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)

    poses_a = [vo_a.process_frame(imgs[i]) for i in range(2, n_frames)]
    poses_b = [vo_b.process_frame(imgs[i]) for i in range(2, n_frames)]
    # psum reduction order differs from the single-device einsum order,
    # so agreement is float-tolerance, not bitwise
    np.testing.assert_allclose(np.stack(poses_a), np.stack(poses_b),
                               atol=5e-4)
    assert int(vo_b.lm_valid.sum()) > 50


def test_vo_multistream_batch_matches_single(rng):
    """The vmapped multi-stream engine must advance each stream exactly
    as its own single-stream engine does (streams share config but have
    independent states/frames)."""
    from invcompcamtrack_tpu.vo.engine import VisualOdometryBatch

    n_frames = 8
    scene, _, _, _ = _small_setup(rng, 2)
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cfg = VOConfig(tracker=tracker, max_landmarks=96, window=4,
                   keyframe_stride=2, corners_per_kf=96, min_parallax_px=0.5)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)

    streams, engines = [], []
    for r in range(3):
        rr = np.random.default_rng(20 + r)
        poses = [np.zeros(6)]
        for _ in range(1, n_frames):
            poses.append(poses[-1] + np.r_[rr.normal(size=3) * 0.015,
                                           rr.normal(size=3) * 0.004])
        poses = np.stack(poses)
        imgs = np.stack([synthetic.render(scene, geo.se3_exp(p))
                         for p in poses])
        vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
        seeds = synthetic.sample_plane_points(
            scene, np.random.default_rng(7), 80, margin=20)
        vo.bootstrap(imgs[0], imgs[1], poses[0], poses[1], seeds)
        streams.append(imgs)
        engines.append(vo)

    # single-stream oracle trajectories (run AFTER capturing states)
    batch = VisualOdometryBatch(engines)
    single = np.stack([vo.run_frames(imgs[2:])
                       for vo, imgs in zip(engines, streams)])
    batched = batch.run_frames(np.stack([s[2:] for s in streams]))
    np.testing.assert_allclose(batched, single, atol=1e-5)
    # final landmark tables agree too
    for r, vo in enumerate(engines):
        np.testing.assert_allclose(
            np.asarray(batch.state_of(r).landmarks),
            np.asarray(vo.state.landmarks), atol=1e-4)


def test_vo_engine_temporal_sharded_ba_parity(rng):
    """The engine's keyframe-sharded temporal BA product path
    (VOConfig.ba_temporal_mesh routes the JOINT window-BA phase to
    ba/temporal.py over a 4-device "seq" mesh) must track the
    single-device joint solver's trajectory.  The solvers differ in the
    reduced solve (distributed PCG vs dense) and in the odometry-factor
    parameterization (coefficient-space chain linearized at the current
    pose vs group-space factors), so agreement is engineering tolerance,
    not bitwise; both must stay at the same accuracy against GT."""
    import jax
    from jax.sharding import Mesh

    n_frames = 14
    scene, poses_gt, imgs, _ = _small_setup(rng, n_frames)
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    base = dict(tracker=tracker, max_landmarks=128, window=4,
                keyframe_stride=2, corners_per_kf=128,
                min_parallax_px=0.5, ba_mode="full")
    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), axis_names=("seq",))

    vo_a = VisualOdometry(cam, scene.fc, scene.cc, VOConfig(**base))
    vo_b = VisualOdometry(cam, scene.fc, scene.cc,
                          VOConfig(**base, ba_temporal_mesh=mesh))

    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo_a.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    vo_b.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)

    poses_a = np.stack([vo_a.process_frame(imgs[i])
                        for i in range(2, n_frames)])
    poses_b = np.stack([vo_b.process_frame(imgs[i])
                        for i in range(2, n_frames)])
    assert np.all(np.isfinite(poses_b))
    np.testing.assert_allclose(poses_a, poses_b, atol=1.5e-2)

    # both trajectories at the same accuracy against ground truth
    gt = np.stack([geo.se3_log(geo.se3_exp(p)) for p in poses_gt[2:]])
    err_a = np.abs(poses_a - gt).max()
    err_b = np.abs(poses_b - gt).max()
    assert err_b < max(2.5 * err_a, 1e-2), (err_a, err_b)
    assert int(vo_b.lm_valid.sum()) > 50


def test_vo_engine_temporal_hybrid_polish(rng):
    """ba_temporal_mesh with the hybrid default: the joint phase is the
    motion-only pose polish (landmarks frozen through the temporal
    solver) and the engine must stay finite and accurate."""
    import jax
    from jax.sharding import Mesh

    n_frames = 12
    scene, poses_gt, imgs, _ = _small_setup(rng, n_frames)
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), axis_names=("seq",))
    cfg = VOConfig(tracker=tracker, max_landmarks=128, window=4,
                   keyframe_stride=2, corners_per_kf=128,
                   min_parallax_px=0.5, ba_mode="hybrid",
                   ba_temporal_mesh=mesh)
    vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    poses = np.stack([vo.process_frame(imgs[i]) for i in range(2, n_frames)])
    assert np.all(np.isfinite(poses))
    gt = np.stack([geo.se3_log(geo.se3_exp(p)) for p in poses_gt[2:]])
    assert np.abs(poses - gt).max() < 0.05


def test_vo_polish_forwardness_gate(rng):
    """The hybrid pose polish must NOT fire under lateral motion (the
    window's LK factors only add noise there — hybrid must equal
    structure exactly), and MUST fire under forward motion (the
    odometer's drift axis).  Pins the polish_min_forwardness gate."""
    scene = synthetic.make_scene(rng, wh=(256, 192), fc=(300.0, 310.0),
                                 z0=8.0, freq_range=(0.5, 6.0))
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    n = 14

    def run(path_step, mode, **over):
        poses = [np.zeros(6)]
        for i in range(1, n):
            poses.append(poses[-1] + path_step(i))
        poses = np.stack(poses)
        imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses]
        cfg = VOConfig(tracker=tracker, max_landmarks=128, window=4,
                       keyframe_stride=2, corners_per_kf=128,
                       min_parallax_px=0.5, ba_mode=mode, **over)
        vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
        seeds = synthetic.sample_plane_points(
            scene, np.random.default_rng(3), 100, margin=20)
        vo.bootstrap(imgs[0], imgs[1], poses[0], poses[1], seeds)
        return np.stack([vo.process_frame(imgs[i]) for i in range(2, n)])

    # lateral: deep plane keeps parallax under the 1.5deg gate, but the
    # forwardness gate must still veto the polish -> exactly structure
    lat = lambda i: np.r_[0.02, 0.002 * np.sin(i * 0.3), 0.004,
                          np.zeros(3)]
    p_hy = run(lat, "hybrid")
    p_st = run(lat, "structure")
    np.testing.assert_allclose(p_hy, p_st, atol=1e-7)

    # forward: both gates open -> the polish must actually run.  Pin the
    # GATE with the motion-only polish variant (its pose step is always
    # accepted and measurably nonzero); the default joint-landmark
    # polish may legitimately be a bitwise no-op on this exactly-
    # rendered plane (the LM accept/reject rejects a step that does not
    # reduce error — "never hurts" by construction), so it is only
    # required to be finite and no worse than structure-mode accuracy.
    fwd = lambda i: np.r_[0.002 * np.sin(i * 0.3), 0.001, 0.05, np.zeros(3)]
    p_mo_f = run(fwd, "hybrid", ba_joint_motion_only=True)
    p_st_f = run(fwd, "structure")
    assert np.abs(p_mo_f - p_st_f).max() > 1e-6
    p_hy_f = run(fwd, "hybrid")
    assert np.all(np.isfinite(p_hy_f))
    # default hybrid tracks the same trajectory at least as tightly as
    # structure mode (no-worse guarantee of the accept/reject)
    gt_f = np.stack([np.sum([fwd(j) for j in range(1, i + 1)], axis=0)
                     for i in range(2, n)])
    assert np.abs(p_hy_f - gt_f).max() <= np.abs(p_st_f - gt_f).max() + 1e-6


def test_vo_polish_turnover_routing(rng):
    """polish_joint_turnover: on a MATURE map (no re-triangulation) the
    fired polish must run MOTION-ONLY against the structure-refined
    landmarks — the post-BA map equals structure mode's map exactly —
    while the round-4 behavior (joint-from-raw, turnover gate disabled)
    discards the refined map.  Pins the r4 corridor-noisymap misroute
    fix (VERDICT r4 ask #5)."""
    scene = synthetic.make_scene(rng, wh=(256, 192), fc=(300.0, 310.0),
                                 z0=8.0, freq_range=(0.5, 6.0))
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    n = 14
    poses = [np.zeros(6)]
    for i in range(1, n):
        # forward motion: both polish gates open
        poses.append(poses[-1] + np.r_[0.002 * np.sin(i * 0.3), 0.001,
                                       0.05, np.zeros(3)])
    poses = np.stack(poses)
    imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses]
    # FIXED noisy map: triangulation unreachable -> turnover is 0
    fixed = dict(max_landmarks=128, window=4, keyframe_stride=2,
                 corners_per_kf=128, min_parallax_px=1e9,
                 max_obs_fail=10 ** 6, reobs_gate_px=48.0,
                 ba_obs_gate_px=48.0)
    seeds = synthetic.sample_plane_points(
        scene, np.random.default_rng(3), 100, margin=20)
    seeds = seeds + np.random.default_rng(4).normal(size=seeds.shape) * 0.1

    def run(mode, **over):
        cfg = VOConfig(tracker=tracker, ba_mode=mode, **fixed, **over)
        vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
        vo.bootstrap(imgs[0], imgs[1], poses[0], poses[1], seeds)
        tr = np.stack([vo.process_frame(imgs[i]) for i in range(2, n)])
        return tr, np.asarray(vo.landmarks), np.asarray(vo.lm_valid)

    tr_st, lm_st, v_st = run("structure")
    tr_hy, lm_hy, v_hy = run("hybrid")
    tr_mo, lm_mo, v_mo = run("hybrid", ba_joint_motion_only=True)
    tr_raw, lm_raw, v_raw = run("hybrid", polish_joint_turnover=-1.0)

    # with zero turnover the dynamic routing must pick motion-only-
    # against-refined EVERY step: identical to the static
    # ba_joint_motion_only=True engine (same branch, same numbers)
    np.testing.assert_allclose(tr_hy, tr_mo, atol=1e-6)
    np.testing.assert_array_equal(v_hy, v_mo)
    np.testing.assert_allclose(lm_hy[v_hy], lm_mo[v_mo], atol=1e-6)
    # ... and its poses are POLISHED (the motion-only step actually ran)
    assert np.abs(tr_hy - tr_st).max() > 1e-6
    # the gate-disabled variant reverts to the r4 joint-from-raw
    # behavior: a different trajectory (the refined map is discarded)
    assert np.abs(tr_raw - tr_hy).max() > 1e-6


def test_vo_info_weighted_prior_runs(rng):
    """odo_info_weighted: the engine records the tracker's Fisher
    information per keyframe and the info-weighted joint phase stays
    finite and accurate (the measured accuracy tradeoffs live in
    ACCURACY.md; this pins the mechanism)."""
    n_frames = 12
    scene, poses_gt, imgs, _ = _small_setup(rng, n_frames)
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    cfg = VOConfig(tracker=tracker, max_landmarks=128, window=4,
                   keyframe_stride=2, corners_per_kf=128,
                   min_parallax_px=0.5, ba_mode="full",
                   odo_info_weighted=True)
    vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    poses = np.stack([vo.process_frame(imgs[i]) for i in range(2, n_frames)])
    assert np.all(np.isfinite(poses))
    gt = np.stack([geo.se3_log(geo.se3_exp(p)) for p in poses_gt[2:]])
    assert np.abs(poses - gt).max() < 0.05
    # the recorded information is symmetric PSD where recorded
    info = np.asarray(vo.state.kf_rel_info)
    rec = np.asarray(vo.state.kf_rel_valid) & (
        np.trace(info, axis1=-2, axis2=-1) > 0)
    assert rec.any()
    for Wk in info[rec]:
        np.testing.assert_allclose(Wk, Wk.T, atol=1e-3 * abs(Wk).max())
        assert np.linalg.eigvalsh(Wk).min() > -1e-3 * abs(Wk).max()
