import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.solver.icgn import track_pose, track_pose_batch
from invcompcamtrack_tpu.vo import synthetic
from tests.oracles import geometry_np as geo
from tests.oracles import icgn_np


def _setup(rng, n_pts=80, lv_f=2, wh=(320, 240)):
    scene = synthetic.make_scene(rng, wh=wh)
    p_gt = np.r_[rng.normal(size=3) * 0.02, rng.normal(size=3) * 0.01]
    G_ref = geo.se3_exp(np.zeros(6))
    G_new = geo.se3_exp(p_gt)
    img_ref = synthetic.render(scene, G_ref)
    img_new = synthetic.render(scene, G_new)
    X = synthetic.sample_plane_points(scene, rng, n_pts)
    cfg = ICGNParams(lv_f=lv_f, lv_l=0, psz=8, maxiter=10, normdp_ratio=0.01,
                     donorm=True, dopatchnorm=False)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, cfg.num_levels, cfg.psz)
    return scene, p_gt, img_ref, img_new, X, cfg, cam


def _pose_err(p_a, p_b):
    Ga, Gb = geo.se3_exp(np.asarray(p_a)), geo.se3_exp(np.asarray(p_b))
    ca = -Ga[:, :3].T @ Ga[:, 3]
    cb = -Gb[:, :3].T @ Gb[:, 3]
    rot = np.degrees(
        np.arccos(np.clip((np.trace(Ga[:, :3] @ Gb[:, :3].T) - 1) / 2, -1, 1))
    )
    return np.linalg.norm(ca - cb), rot


def test_icgn_recovers_gt_pose_from_zero_init(rng):
    """Config-1 acceptance: single-pair IC-GN alignment on a synthetic
    scene; initial pose = identity, must converge to the GT pose of the
    new frame (the run_odometer_test.m:146 style check)."""
    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new), cfg.num_levels, cfg.psz)
    p0 = jnp.zeros(6, jnp.float64)

    p_res = np.asarray(track_pose(pyr_ref, pyr_new, jnp.asarray(X), p0, cam, cfg))
    err_t0, err_r0 = _pose_err(np.zeros(6), p_gt)
    err_t, err_r = _pose_err(p_res, p_gt)
    # >90% of the initial error recovered, and absolute accuracy at the
    # sub-0.1-pixel-equivalent level (pixel size ~0.027 world units here)
    assert err_t < err_t0 * 0.1, (err_t, err_t0)
    assert err_r < max(err_r0 * 0.1, 1e-3), (err_r, err_r0)
    assert err_t < 3e-3, err_t


def test_icgn_matches_numpy_oracle(rng):
    """Dual-implementation parity: the jitted float64 tracker must match
    the loop-based numpy oracle almost exactly."""
    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng, n_pts=40, lv_f=1)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new), cfg.num_levels, cfg.psz)
    p0 = jnp.zeros(6, jnp.float64)
    p_jax = np.asarray(track_pose(pyr_ref, pyr_new, jnp.asarray(X), p0, cam, cfg))

    pyr_ref_o = icgn_np.build_pyramid(img_ref, cfg.num_levels, cfg.psz)
    pyr_new_o = icgn_np.build_pyramid(img_new, cfg.num_levels, cfg.psz)
    p_ora = icgn_np.track_pose(
        pyr_ref_o, pyr_new_o, X, np.zeros(6), scene.fc, scene.cc, scene.wh, cfg
    )
    np.testing.assert_allclose(p_jax, p_ora, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("donorm,dopatchnorm", [(False, False), (True, True)])
def test_icgn_oracle_parity_config_variants(rng, donorm, dopatchnorm):
    scene, p_gt, img_ref, img_new, X, _, _ = _setup(rng, n_pts=24, lv_f=1)
    cfg = ICGNParams(lv_f=1, lv_l=0, psz=8, maxiter=5, normdp_ratio=0.01,
                     donorm=donorm, dopatchnorm=dopatchnorm)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, cfg.num_levels, cfg.psz)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new), cfg.num_levels, cfg.psz)
    p_jax = np.asarray(
        track_pose(pyr_ref, pyr_new, jnp.asarray(X), jnp.zeros(6, jnp.float64), cam, cfg)
    )
    p_ora = icgn_np.track_pose(
        icgn_np.build_pyramid(img_ref, cfg.num_levels, cfg.psz),
        icgn_np.build_pyramid(img_new, cfg.num_levels, cfg.psz),
        X, np.zeros(6), scene.fc, scene.cc, scene.wh, cfg,
    )
    np.testing.assert_allclose(p_jax, p_ora, rtol=1e-6, atol=1e-8)


def test_icgn_float32(rng):
    """The production dtype still converges to sub-millipixel accuracy."""
    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng)
    pyr_ref = build_pyramid(jnp.asarray(img_ref, jnp.float32), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new, jnp.float32), cfg.num_levels, cfg.psz)
    p_res = np.asarray(
        track_pose(
            pyr_ref, pyr_new, jnp.asarray(X, jnp.float32),
            jnp.zeros(6, jnp.float32), cam, cfg,
        )
    )
    err_t, _ = _pose_err(p_res, p_gt)
    assert err_t < 5e-3, err_t


def test_icgn_batch_matches_single(rng):
    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng, n_pts=32, lv_f=1)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new), cfg.num_levels, cfg.psz)
    Xb = jnp.stack([jnp.asarray(X), jnp.asarray(X[::-1])])
    p0 = jnp.stack([jnp.zeros(6, jnp.float64), jnp.zeros(6, jnp.float64)])
    pb = np.asarray(track_pose_batch(pyr_ref, pyr_new, Xb, p0, cam, cfg))
    p_single0 = np.asarray(track_pose(pyr_ref, pyr_new, Xb[0], p0[0], cam, cfg))
    p_single1 = np.asarray(track_pose(pyr_ref, pyr_new, Xb[1], p0[1], cam, cfg))
    np.testing.assert_allclose(pb[0], p_single0, rtol=1e-9)
    np.testing.assert_allclose(pb[1], p_single1, rtol=1e-9)


def test_masking_semantics_out_of_frustum_points(rng):
    """Points projecting outside the frustum must contribute nothing (the
    explicit-mask replacement of the reference's memset/stale-sd quirk,
    SURVEY.md §3.1): adding garbage far-away points must not change the
    result vs. not including them at all."""
    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng, n_pts=40, lv_f=1)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new), cfg.num_levels, cfg.psz)
    p0 = jnp.zeros(6, jnp.float64)
    p_clean = np.asarray(track_pose(pyr_ref, pyr_new, jnp.asarray(X), p0, cam, cfg))

    cfg_nn = ICGNParams(**{**cfg.__dict__, "donorm": False})
    p_clean_nn = np.asarray(track_pose(pyr_ref, pyr_new, jnp.asarray(X), p0, cam, cfg_nn))
    # same points + garbage that projects far outside the image
    X_bad = np.concatenate([X, X + np.array([500.0, 500.0, 0.0])], axis=0)
    p_masked = np.asarray(
        track_pose(pyr_ref, pyr_new, jnp.asarray(X_bad), p0, cam, cfg_nn)
    )
    np.testing.assert_allclose(p_masked, p_clean_nn, rtol=1e-8, atol=1e-10)
    del p_clean


def test_icgn_jit_and_aux(rng):
    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng, n_pts=32, lv_f=1)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new), cfg.num_levels, cfg.psz)

    fn = jax.jit(
        lambda a, b, Xa, pa: track_pose(a, b, Xa, pa, cam, cfg, return_aux=True)
    )
    p_res, aux = fn(pyr_ref, pyr_new, jnp.asarray(X), jnp.zeros(6, jnp.float64))
    assert aux.iters.shape == (cfg.lv_f - cfg.lv_l + 1,)
    assert int(aux.valid_ref[0]) == 32
    assert np.all(np.asarray(aux.iters) >= 1)
    p_eager = np.asarray(
        track_pose(pyr_ref, pyr_new, jnp.asarray(X), jnp.zeros(6, jnp.float64), cam, cfg)
    )
    np.testing.assert_allclose(np.asarray(p_res), p_eager, rtol=1e-9)


def test_window_cache_matches_direct_gather(rng):
    """The window-cache fast path must be bit-equal to the per-iteration
    gather while iterates stay within the window slack (normal motion)."""
    scene, p_gt, img_ref, img_new, X, _, _ = _setup(rng, n_pts=48, lv_f=2)
    base = dict(lv_f=2, lv_l=0, psz=8, maxiter=8, normdp_ratio=0.01,
                donorm=True, dopatchnorm=False)
    cfg_on = ICGNParams(**base, window_cache=True)
    cfg_off = ICGNParams(**base, window_cache=False)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, 3, 8)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), 3, 8)
    pyr_new = build_pyramid(jnp.asarray(img_new), 3, 8)
    p0 = jnp.zeros(6, jnp.float64)
    p_on = np.asarray(track_pose(pyr_ref, pyr_new, jnp.asarray(X), p0, cam, cfg_on))
    p_off = np.asarray(track_pose(pyr_ref, pyr_new, jnp.asarray(X), p0, cam, cfg_off))
    np.testing.assert_allclose(p_on, p_off, rtol=0, atol=0)


def test_dopatchnorm_rescues_exposure_drift(rng):
    """The degradation harness's exposure model vs the reference's
    countermeasure: under a gain+bias photometric change between frames
    (vo/synthetic.py::degrade), patch mean-normalization (dopatchnorm,
    reference: utilities.cpp:111-112) must keep the tracker accurate,
    and must beat the unnormalized tracker decisively."""
    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng)
    img_new_deg = synthetic.degrade(
        img_new, np.random.default_rng(3),
        exposure_gain=1.2, exposure_bias=12.0, noise_sigma=1.0)

    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_deg = build_pyramid(jnp.asarray(img_new_deg), cfg.num_levels, cfg.psz)
    p0 = jnp.zeros(6, jnp.float64)

    errs = {}
    for pn in (False, True):
        cfg_pn = ICGNParams(lv_f=cfg.lv_f, lv_l=0, psz=8, maxiter=10,
                            normdp_ratio=0.01, donorm=True, dopatchnorm=pn)
        p_res = np.asarray(track_pose(pyr_ref, pyr_deg, jnp.asarray(X), p0,
                                      cam, cfg_pn))
        errs[pn], _ = _pose_err(p_res, p_gt)

    err_t0, _ = _pose_err(np.zeros(6), p_gt)
    # normalized tracking still recovers most of the initial error
    # (mean subtraction absorbs the bias fully and the gain's effect on
    # the patch mean; the gain's CONTRAST change remains — the
    # reference's dopatchnorm is mean-only too)...
    assert errs[True] < err_t0 * 0.5, (errs, err_t0)
    # ...and is markedly better than unnormalized
    assert errs[True] < errs[False] * 0.5, errs


def test_aux_hessian_unnormalized_matches_donorm_off(rng):
    """aux.hessian must be the finest-scale GN normal matrix in CALLER
    pose coordinates: with donorm the normalized-coordinate Hessian is
    mapped back through the normalize-pose Jacobian, so it must match
    the donorm=False run's Hessian on the same geometry (same patches,
    same Jacobian chain) to float tolerance, and be symmetric PSD."""
    import dataclasses
    import jax

    scene, p_gt, img_ref, img_new, X, cfg, cam = _setup(rng)
    pyr_ref = build_pyramid(jnp.asarray(img_ref), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new), cfg.num_levels, cfg.psz)
    Xj = jnp.asarray(X)
    p0 = jnp.zeros(6, jnp.float64)

    Hs = {}
    for donorm in (True, False):
        cfg_d = dataclasses.replace(cfg, donorm=donorm)
        _, aux = track_pose(pyr_ref, pyr_new, Xj, p0, cam, cfg_d,
                            return_aux=True)
        Hs[donorm] = np.asarray(aux.hessian, np.float64)

    for H in Hs.values():
        np.testing.assert_allclose(H, H.T, rtol=1e-9)
        assert np.linalg.eigvalsh(H).min() > -1e-9 * abs(H).max()
    # The translation block's varval scaling maps EXACTLY (the pinhole
    # translation rows scale linearly with the similarity).  Rotation
    # entries agree only to O(1): the IC steepest-descent Jacobian is a
    # LOCAL-TWIST formula applied to a coefficient-additive update
    # (reference quirk, odometer.cpp:313-327 + pose.cpp:116-129), so
    # the approximation differs between parameterizations.  The
    # odometry-prior weight this feeds only needs scale-correct
    # curvature, not exact rotation entries.
    np.testing.assert_allclose(Hs[True][:3, :3], Hs[False][:3, :3],
                               rtol=1e-3)
    ratio = Hs[True][3:, 3:] / Hs[False][3:, 3:]
    assert 0.25 < np.abs(ratio).min() and np.abs(ratio).max() < 4.0, ratio
