import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.ba.window import BAProblem, ba_residuals, ba_solve
from tests.oracles import geometry_np as geo


def _make_problem(rng, K=6, L=64, noise=0.0, perturb_pose=0.01, perturb_lm=0.05,
                  drop=0.1):
    fx, fy, cx, cy = 400.0, 410.0, 320.0, 240.0
    X_gt = rng.normal(size=(L, 3)) * 3 + [0, 0, 12]
    poses_gt = []
    for k in range(K):
        t = np.array([0.4 * k, 0.02 * k, 0.0]) + rng.normal(size=3) * 0.02
        w = rng.normal(size=3) * 0.01
        # pose maps world->cam; camera center ~ t
        G = geo.se3_exp(np.concatenate([np.zeros(3), w]))
        R = G[:, :3]
        poses_gt.append(geo.se3_log(np.concatenate([R, (-R @ t)[:, None]], 1)))
    poses_gt = np.stack(poses_gt)

    obs = np.zeros((K, L, 2))
    for k in range(K):
        uv, Xc = geo.project(geo.se3_exp(poses_gt[k]), X_gt, fx, fy, cx, cy)
        obs[k] = uv + rng.normal(size=uv.shape) * noise
    mask = rng.uniform(size=(K, L)) > drop
    mask[:2, :] |= True  # anchor frames see everything

    prob = BAProblem(
        poses=jnp.asarray(poses_gt + rng.normal(size=poses_gt.shape) * perturb_pose
                          * (np.arange(K) >= 2)[:, None]),
        landmarks=jnp.asarray(X_gt + rng.normal(size=X_gt.shape) * perturb_lm),
        obs=jnp.asarray(obs),
        mask=jnp.asarray(mask),
        fx=jnp.asarray(fx), fy=jnp.asarray(fy),
        cx=jnp.asarray(cx), cy=jnp.asarray(cy),
        fixed_pose_mask=jnp.asarray(np.arange(K) < 2),
    )
    return prob, poses_gt, X_gt


def test_ba_zero_residual_at_gt(rng):
    prob, poses_gt, X_gt = _make_problem(rng, perturb_pose=0.0, perturb_lm=0.0)
    _, msq = ba_residuals(prob)
    assert float(msq) < 1e-18


def test_ba_converges_to_gt_noiseless(rng):
    prob, poses_gt, X_gt = _make_problem(rng)
    _, err0 = ba_residuals(prob)
    poses, lms, (err, _) = ba_solve(prob, num_iters=15)
    assert float(err) < 1e-10, (float(err0), float(err))
    np.testing.assert_allclose(np.asarray(poses), poses_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lms), X_gt, atol=1e-4)


def test_ba_noisy_reduces_error_substantially(rng):
    prob, poses_gt, X_gt = _make_problem(rng, noise=0.3, perturb_pose=0.02,
                                         perturb_lm=0.1)
    _, err0 = ba_residuals(prob)
    poses, lms, (err, _) = ba_solve(prob, num_iters=15)
    # converged error ~ observation noise level: 0.3^2/2 * 2 dims ~ 0.09
    assert float(err) < 0.2, float(err)
    assert float(err) < float(err0) * 0.5
    # pose accuracy at the noise-limited level (0.3 px obs noise,
    # 2-pose gauge anchor -> ~1% translation error)
    derr = np.abs(np.asarray(poses) - poses_gt)
    assert derr[2:, :3].max() < 0.04
    assert derr[2:, 3:].max() < 0.01


def test_ba_fixed_poses_unchanged(rng):
    prob, poses_gt, _ = _make_problem(rng)
    poses, _, _ = ba_solve(prob, num_iters=5)
    np.testing.assert_allclose(np.asarray(poses[:2]), np.asarray(prob.poses[:2]),
                               atol=0)


def test_ba_masked_observations_ignored(rng):
    """Corrupting masked-out observations must not change the result."""
    prob, _, _ = _make_problem(rng)
    poses1, lms1, _ = ba_solve(prob, num_iters=8)
    obs_bad = jnp.where(prob.mask[..., None], prob.obs, 1e6)
    prob2 = prob._replace(obs=obs_bad)
    poses2, lms2, _ = ba_solve(prob2, num_iters=8)
    np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses2), atol=0)
    np.testing.assert_allclose(np.asarray(lms1), np.asarray(lms2), atol=0)


def test_ba_huber_resists_outliers(rng):
    """Inject gross outliers into 10% of the observations: pure-L2 BA is
    dragged away from GT, Huber-weighted BA stays at GT accuracy."""
    prob, poses_gt, X_gt = _make_problem(rng, noise=0.05, perturb_pose=0.01,
                                         perturb_lm=0.05, drop=0.0)
    obs = np.asarray(prob.obs).copy()
    out_mask = rng.uniform(size=obs.shape[:2]) < 0.1
    obs[out_mask] += rng.normal(size=(out_mask.sum(), 2)) * 80.0
    prob = prob._replace(obs=jnp.asarray(obs))

    poses_l2, lms_l2, _ = ba_solve(prob, num_iters=30)
    poses_hu, lms_hu, _ = ba_solve(prob, num_iters=30, huber_delta=1.0)

    def pose_err(p):
        return np.linalg.norm(np.asarray(p) - poses_gt, axis=1).max()

    assert pose_err(poses_hu) < 0.02, pose_err(poses_hu)
    assert pose_err(poses_hu) < 0.5 * pose_err(poses_l2), (
        pose_err(poses_hu), pose_err(poses_l2))
    lm_err_hu = np.linalg.norm(np.asarray(lms_hu) - X_gt, axis=1)
    lm_err_l2 = np.linalg.norm(np.asarray(lms_l2) - X_gt, axis=1)
    assert np.median(lm_err_hu) < np.median(lm_err_l2)


def test_ba_huber_matches_l2_inliers_only(rng):
    """With no outliers and residuals below delta, Huber == L2 exactly."""
    prob, poses_gt, X_gt = _make_problem(rng, perturb_pose=0.005,
                                         perturb_lm=0.02)
    p1, l1, (e1, _) = ba_solve(prob, num_iters=10)
    p2, l2, (e2, _) = ba_solve(prob, num_iters=10, huber_delta=1e4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-7)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-5, atol=1e-18)


def test_ba_structure_low_parallax_guarded(rng):
    """Forward motion + fixed (slightly inconsistent) poses: rays to an
    on-axis landmark are near-parallel, so H_ll is near-singular along
    the ray and unguarded LM slides landmarks enormous distances while
    the global cost still drops (the corridor-fwd divergence).  The
    trust-region clip + per-landmark accept must keep the map bounded
    near the scene."""
    fx, fy, cx, cy = 520.0, 525.0, 320.0, 240.0
    K, L = 6, 16
    X_gt = np.c_[rng.uniform(-1.5, 1.5, L), rng.uniform(-1.0, 1.0, L),
                 rng.uniform(18.0, 24.0, L)]
    poses_true, poses_fix = [], []
    for k in range(K):
        c = np.array([0.0, 0.0, 0.12 * k])          # forward drive
        p_true = np.concatenate([-c, np.zeros(3)])  # R=I, t=-c
        poses_true.append(p_true)
        # the "drifted odometer" poses BA is forced to hold fixed
        dp = np.concatenate([rng.normal(size=3) * 0.02,
                             rng.normal(size=3) * 2e-3])
        poses_fix.append(p_true + dp)
    poses_true, poses_fix = np.stack(poses_true), np.stack(poses_fix)

    obs = np.zeros((K, L, 2))
    for k in range(K):
        uv, _ = geo.project(geo.se3_exp(poses_true[k]), X_gt, fx, fy, cx, cy)
        obs[k] = uv + rng.normal(size=uv.shape) * 0.3
    prob = BAProblem(
        poses=jnp.asarray(poses_fix),
        landmarks=jnp.asarray(X_gt + rng.normal(size=X_gt.shape) * 0.05),
        obs=jnp.asarray(obs), mask=jnp.ones((K, L), bool),
        fx=jnp.asarray(fx), fy=jnp.asarray(fy),
        cx=jnp.asarray(cx), cy=jnp.asarray(cy),
        fixed_pose_mask=jnp.ones((K,), bool),
    )
    _, lms_raw, _ = ba_solve(prob, num_iters=8, huber_delta=1.5)
    _, lms_g, _ = ba_solve(prob, num_iters=8, huber_delta=1.5,
                           lm_step_clip=0.1, per_landmark_accept=True,
                           damp_min=1e-5, lm_eig_floor=5e-3)
    err_raw = np.linalg.norm(np.asarray(lms_raw) - X_gt, axis=1)
    err_g = np.linalg.norm(np.asarray(lms_g) - X_gt, axis=1)
    # guarded refinement stays in the scene's vicinity...
    assert err_g.max() < 5.0, err_g.max()
    # ...and is no worse than the unguarded solve anywhere it matters
    assert err_g.max() <= err_raw.max() + 1e-6, (err_g.max(), err_raw.max())


def test_ba_guards_mild_on_well_conditioned(rng):
    """On a well-conditioned (lateral-baseline) problem the guards may
    leave a little landmark polish on the table (truncated directions
    keep their initialization error) but must stay at the same accuracy
    scale — and pose accuracy must not degrade."""
    prob, poses_gt, X_gt = _make_problem(rng, noise=0.1, perturb_pose=0.01,
                                         perturb_lm=0.05)
    p1, l1, (e1, _) = ba_solve(prob, num_iters=12)
    p2, l2, (e2, _) = ba_solve(prob, num_iters=12, lm_step_clip=0.1,
                               per_landmark_accept=True, damp_min=1e-5,
                               lm_eig_floor=5e-3)
    assert float(e2) < 2.5 * float(e1), (float(e1), float(e2))
    lmerr1 = np.abs(np.asarray(l1) - X_gt).max()
    lmerr2 = np.abs(np.asarray(l2) - X_gt).max()
    assert lmerr2 < 2.0 * lmerr1 + 1e-3, (lmerr1, lmerr2)
    poseerr1 = np.abs(np.asarray(p1) - poses_gt).max()
    poseerr2 = np.abs(np.asarray(p2) - poses_gt).max()
    assert poseerr2 < 1.5 * poseerr1 + 1e-4, (poseerr1, poseerr2)


def test_ba_active_with_degenerate_masked_slots(rng):
    """Masked-out slots at the origin project to inf when a camera sits
    at z=0 (the engine's empty landmark slots).  With multiplicative
    masking inf*0=NaN poisoned the global cost and silently turned BA
    into a no-op; where()-masking must keep BA fully active."""
    prob, poses_gt, X_gt = _make_problem(rng, L=48, noise=0.0,
                                         perturb_pose=0.02, perturb_lm=0.1)
    # append 16 dead slots at the origin, masked everywhere
    K = prob.mask.shape[0]
    lms = jnp.concatenate([prob.landmarks, jnp.zeros((16, 3))], axis=0)
    obs = jnp.concatenate([prob.obs, jnp.zeros((K, 16, 2))], axis=1)
    mask = jnp.concatenate([prob.mask, jnp.zeros((K, 16), bool)], axis=1)
    # camera 0 sits at the origin -> dead slots are exactly at its
    # center, projecting to inf/NaN
    prob = prob._replace(landmarks=lms, obs=obs, mask=mask)

    _, err0 = ba_residuals(prob)
    assert np.isfinite(float(err0)), "masked degenerate slots leaked NaN"
    poses, lms_out, (err, _) = ba_solve(prob, num_iters=15)
    assert np.isfinite(float(err))
    assert float(err) < 1e-10, f"BA was a no-op: err {float(err)}"
    np.testing.assert_allclose(np.asarray(poses), poses_gt, atol=1e-5)
    # the dead slots must not move and must stay finite
    np.testing.assert_allclose(np.asarray(lms_out[48:]), 0.0, atol=0)


def test_ba_cg_matches_dense(rng):
    """Matrix-free PCG reduced-camera solve must reproduce the dense
    Schur solve to solver precision."""
    prob, poses_gt, X_gt = _make_problem(rng, K=8, L=96, noise=0.1,
                                         perturb_pose=0.02, perturb_lm=0.08)
    p_d, l_d, (e_d, _) = ba_solve(prob, num_iters=8)
    p_c, l_c, (e_c, _) = ba_solve(prob, num_iters=8, reduced_solver="cg",
                                  cg_iters=60)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_d),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(e_c), float(e_d), rtol=1e-6)


def test_ba_cg_long_window(rng):
    """K=32 window (6K=192 reduced system): the CG path converges to GT
    on a noiseless long-window problem — the regime where the dense
    (6K)^2 materialization is the scaling wall."""
    prob, poses_gt, X_gt = _make_problem(rng, K=32, L=256, noise=0.0,
                                         perturb_pose=0.01, perturb_lm=0.05,
                                         drop=0.3)
    poses, lms, (err, err0) = ba_solve(prob, num_iters=12,
                                       reduced_solver="cg", cg_iters=80)
    assert float(err) < 1e-8, (float(err0), float(err))
    np.testing.assert_allclose(np.asarray(poses), poses_gt, atol=1e-4)


def _odo_from(poses, w_t=100.0, w_r=1000.0, drop_first=True):
    """OdoFactors with rel measured exactly from the given (K, 6) poses."""
    from invcompcamtrack_tpu.ba.window import OdoFactors

    K = poses.shape[0]
    G = np.stack([geo.se3_exp(p) for p in np.asarray(poses)])
    rel = np.zeros((K, 3, 4))
    for k in range(K):
        Gp = G[(k - 1) % K]
        Rp, tp = Gp[:, :3], Gp[:, 3]
        inv = np.concatenate([Rp.T, (-Rp.T @ tp)[:, None]], 1)
        R = G[k][:, :3] @ inv[:, :3]
        t = G[k][:, :3] @ inv[:, 3] + G[k][:, 3]
        rel[k] = np.concatenate([R, t[:, None]], 1)
    mask = np.ones(K, bool)
    if drop_first:
        mask[0] = False  # ring wraparound factor
    return OdoFactors(jnp.asarray(rel), jnp.asarray(mask),
                      jnp.asarray(w_t), jnp.asarray(w_r))


def test_ba_odo_prior_zero_at_consistency(rng):
    """Odometry residuals vanish when poses match the measurements, and
    a consistent prior does not degrade the noiseless solution."""
    from invcompcamtrack_tpu.ba.window import odo_residuals

    prob, poses_gt, X_gt = _make_problem(rng)
    odo = _odo_from(poses_gt)
    r = odo_residuals(jnp.asarray(poses_gt), odo)
    assert float(jnp.abs(r).max()) < 1e-10
    poses, lms, (err, _) = ba_solve(prob, num_iters=15, odo=odo)
    np.testing.assert_allclose(np.asarray(poses), poses_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lms), X_gt, atol=1e-4)


def test_ba_odo_prior_rescues_weak_structure(rng):
    """With few, noisy observations the reprojection-only solution drifts;
    accurate odometry factors must pull the poses back toward GT."""
    prob, poses_gt, X_gt = _make_problem(rng, L=12, noise=1.0,
                                         perturb_pose=0.02, perturb_lm=0.1,
                                         drop=0.4)
    odo = _odo_from(poses_gt)
    p_no, _, _ = ba_solve(prob, num_iters=10, huber_delta=1.5)
    p_odo, _, _ = ba_solve(prob, num_iters=10, huber_delta=1.5, odo=odo)
    e_no = float(np.abs(np.asarray(p_no) - poses_gt).max())
    e_odo = float(np.abs(np.asarray(p_odo) - poses_gt).max())
    assert e_odo < e_no, (e_no, e_odo)
    assert e_odo < 0.005, e_odo


def test_ba_odo_prior_cg_matches_dense(rng):
    prob, poses_gt, X_gt = _make_problem(rng, K=8, L=96, noise=0.1,
                                         perturb_pose=0.02, perturb_lm=0.08)
    odo = _odo_from(poses_gt)
    p_d, _, (e_d, _) = ba_solve(prob, num_iters=8, odo=odo)
    p_c, _, (e_c, _) = ba_solve(prob, num_iters=8, odo=odo,
                                reduced_solver="cg", cg_iters=60)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(e_c), float(e_d), rtol=1e-5)


def test_ba_odo_prior_masked_factors_inert(rng):
    """Factors with mask=False must not influence the solve at all —
    garbage rel measurements behind a False mask are harmless."""
    prob, poses_gt, X_gt = _make_problem(rng, noise=0.2)
    odo = _odo_from(poses_gt)
    bad_rel = jnp.asarray(np.random.default_rng(3).normal(
        size=odo.rel.shape))
    odo_off = odo._replace(rel=bad_rel,
                           mask=jnp.zeros_like(odo.mask))
    p_ref, l_ref, (e_ref, _) = ba_solve(prob, num_iters=8)
    p_off, l_off, (e_off, _) = ba_solve(prob, num_iters=8, odo=odo_off)
    np.testing.assert_allclose(np.asarray(p_off), np.asarray(p_ref),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(e_off), float(e_ref), rtol=1e-6)


def test_ba_motion_only_polishes_poses_without_touching_landmarks(rng):
    """motion_only=True must leave landmarks bit-identical and still
    recover perturbed poses against a good map (the hybrid engine's
    pose-polish phase)."""
    prob, poses_gt, X_gt = _make_problem(rng, perturb_pose=0.01,
                                         perturb_lm=0.0)
    p, l, (e, e0) = ba_solve(prob, num_iters=8, motion_only=True)
    assert np.array_equal(np.asarray(l), np.asarray(prob.landmarks))
    assert float(e) < float(e0) * 1e-3, (float(e0), float(e))
    np.testing.assert_allclose(np.asarray(p), poses_gt, atol=1e-4)


def test_ba_repairs_triangulation_depth_noise(rng):
    """The reference's headline refinement result — 3D points with
    triangulation-shaped (ray-aligned) depth noise repaired from
    multi-view observations (reference: misc_src/pose_tracking_acc.txt
    improves 10-80x; triang.c:378-435 depth-only refiner).  The
    structure solver must reduce the 3D RMS error by >=100x when the
    window geometry observes the depths."""
    from invcompcamtrack_tpu.ba.window import BAProblem

    r2 = np.random.default_rng(0)
    K, L = 10, 256
    side = r2.choice([-1.0, 1.0], L)
    X_gt = np.c_[side * 4.0, r2.uniform(-2, 2, L),
                 r2.uniform(4, 12, L)].astype(np.float32)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 2] = -0.12 * np.arange(K)  # forward motion
    prob0 = BAProblem(
        poses=jnp.asarray(poses), landmarks=jnp.asarray(X_gt),
        obs=jnp.zeros((K, L, 2), jnp.float32), mask=jnp.ones((K, L), bool),
        fx=jnp.asarray(520.0), fy=jnp.asarray(525.0),
        cx=jnp.asarray(320.0), cy=jnp.asarray(240.0),
        fixed_pose_mask=jnp.ones((K,), bool))
    res0, _ = ba_residuals(prob0)
    eta = r2.normal(size=(L, 1)).astype(np.float32) * 0.15
    lms = jnp.asarray(X_gt * (1.0 + eta))  # ray-aligned depth noise
    prob = prob0._replace(landmarks=lms, obs=-res0)

    _, l_out, (e, e0) = ba_solve(prob, num_iters=10, huber_delta=4.0,
                                 per_landmark_accept=True, damp_min=1e-5)
    err_in = float(jnp.sqrt(jnp.mean((lms - X_gt) ** 2)))
    err_out = float(jnp.sqrt(jnp.mean((l_out - X_gt) ** 2)))
    assert err_out < err_in / 100.0, (err_in, err_out)


def test_odo_info_sqrt_matches_isotropic(rng):
    """OdoFactors.info_sqrt with a diagonal sqrt diag(w_t, w_r) must
    reproduce the legacy isotropic weighting exactly, and a full
    anisotropic info matrix must weight the factor cost as
    ru^T (S^T S) ru."""
    import jax
    from invcompcamtrack_tpu.ba.window import OdoFactors, odo_residuals
    from invcompcamtrack_tpu.core import lie
    import jax.numpy as jnp

    K = 5
    poses = jnp.asarray(rng.normal(size=(K, 6)) * 0.1)
    G = jax.vmap(lie.se3_exp)(poses)
    rel = lie.se3_compose(G, lie.se3_inverse(jnp.roll(G, 1, axis=0)))
    # perturb the measurements so residuals are nonzero
    rel = rel.at[:, :, 3].add(jnp.asarray(rng.normal(size=(K, 3)) * 0.01))
    mask = jnp.asarray([False, True, True, True, True])
    w_t, w_r = 37.0, 113.0

    iso = OdoFactors(rel=rel, mask=mask, w_t=jnp.asarray(w_t),
                     w_r=jnp.asarray(w_r))
    S = jnp.broadcast_to(jnp.diag(jnp.asarray([w_t] * 3 + [w_r] * 3)),
                         (K, 6, 6))
    info = OdoFactors(rel=rel, mask=mask, w_t=jnp.asarray(w_t),
                      w_r=jnp.asarray(w_r), info_sqrt=S)
    np.testing.assert_allclose(np.asarray(odo_residuals(poses, iso)),
                               np.asarray(odo_residuals(poses, info)),
                               rtol=1e-12)

    # full matrix: r^T r == ru^T W ru with W = S^T S
    A = rng.normal(size=(K, 6, 6))
    S_full = jnp.asarray(np.triu(A))  # any square root works
    ones = OdoFactors(rel=rel, mask=mask, w_t=jnp.asarray(1.0),
                      w_r=jnp.asarray(1.0))
    ru = np.asarray(odo_residuals(poses, ones))  # unweighted coords
    fact = OdoFactors(rel=rel, mask=mask, w_t=jnp.asarray(1.0),
                      w_r=jnp.asarray(1.0), info_sqrt=S_full)
    r = np.asarray(odo_residuals(poses, fact))
    W = np.einsum("kji,kjl->kil", np.asarray(S_full), np.asarray(S_full))
    np.testing.assert_allclose(
        np.sum(r * r, axis=-1),
        np.einsum("ki,kij,kj->k", ru, W, ru) * np.asarray(mask),
        rtol=1e-9, atol=1e-12)
