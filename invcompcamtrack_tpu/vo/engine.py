"""The monocular visual-odometry engine — fused TPU frame steps.

Frame loop (SURVEY.md §7 layer 6): pyramid -> IC-GN pose tracking
against the last keyframe's map points -> keyframe policy -> LK track +
triangulate new landmarks -> sliding-window bundle adjustment.

The reference repo stops at per-pair tracking driven by MATLAB scripts
(reference: run_odometer_test.m:197-244 runs the C++ tracker frame to
frame and compares against GT; BA is an explicit TODO,
run_test_OF_track.py:449-451) — this engine is the integrated,
self-contained completion of that pipeline.

Design (round 2 — fully fused):

- ALL engine state lives in one fixed-shape device pytree ``VOState``
  (landmark table, keyframe ring, observation grid, keyframe pyramid
  stacks).  A frame is processed by exactly ONE jitted program:
  ``_track_step`` for ordinary frames, ``_keyframe_step`` for keyframe
  frames (track + re-observe + triangulate + BA fused).  Host code only
  chooses which program to dispatch (the keyframe cadence is static).
- ``run_frames`` goes further: a ``lax.scan`` over keyframe periods
  processes a whole image chunk in a single dispatch — the engine-level
  throughput path (the host never syncs inside a chunk).
- Bundle adjustment consumes MEASURED observations: at every keyframe,
  landmark patches are LK-tracked (forward/backward verified) from the
  previous keyframe into the new one, so the observation grid holds
  pixel measurements, not reprojections of the current state.  BA is
  Huber-robust (``VOConfig.huber_px``).
- Joint ("full") BA FUSES the photometric odometer instead of
  overriding it: every keyframe promotion records the tracker's
  relative pose prev->new in a ring (``kf_rel``), and those
  measurements enter the window as relative-pose prior factors
  (``ba.window.OdoFactors``).  A window whose structure is young or
  weak (heavy landmark turnover, low parallax) can then never be
  dragged below pure-odometry quality by its reprojection terms.
- Landmark lifecycle: a landmark that fails re-observation
  ``max_obs_fail`` consecutive keyframes while expected visible is
  retired and its slot freed for new triangulations — the fixed-capacity
  analogue of the reference's dead-track compaction
  (reference: misc_src/classoftrack.py:96-100).
- Keyframes live in a ring: promoting overwrites the oldest slot; the
  two newest poses float in BA, everything else is the gauge anchor.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.ba.window import BAProblem, OdoFactors, ba_solve
from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core import pose as pose_ops
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.pyramid import Pyramid, PyramidLevel, build_pyramid
from invcompcamtrack_tpu.match.features import shi_tomasi_corners
from invcompcamtrack_tpu.match.lk import lk_forward_backward
from invcompcamtrack_tpu.sfm.triangulate import triangulate_dlt, triangulate_gn
from invcompcamtrack_tpu.solver.icgn import track_pose


@dataclasses.dataclass
class VOConfig:
    tracker: ICGNParams = dataclasses.field(default_factory=ICGNParams)
    max_landmarks: int = 512
    window: int = 5              # BA keyframe window (ring size)
    keyframe_stride: int = 2     # promote every k-th frame to keyframe
    ba_iters: int = 6
    min_parallax_px: float = 2.0  # parallax needed to triangulate
    lk_psz: int = 8
    corners_per_kf: int = 512
    huber_px: float = 1.5        # BA Huber loss width (pixels)
    reobs_gate_px: float = 4.0   # reprojection gate on measured re-observations
    ba_obs_gate_px: float = 10.0  # hard residual gate: gross outlier obs are
    #                               rejected from the window before BA
    min_tri_angle_deg: float = 0.4  # ray-angle gate on new triangulations
    max_obs_fail: int = 2        # consecutive failures before retirement
    min_kf_for_ba: int = 3
    min_lm_for_ba: int = 12
    ba_mode: str = "hybrid"      # "structure": poses fixed, refine points;
    #                              "full": joint pose+point window BA;
    #                              "hybrid" (default): structure refinement
    #                              pre-pass (exact per-landmark accept), then
    #                              joint BA with odometry priors — map
    #                              quality from the structure phase, drift
    #                              repair from the joint phase
    ba_struct_iters: int = 6     # hybrid: iterations of the structure pre-pass
    ba_joint_motion_only: bool = False  # hybrid: when True, the joint
    #   phase refines POSES only (landmarks frozen at the structure-
    #   phase result).  Round-3 shipped True: batched f32
    #   jnp.linalg.eigh (iterative Jacobi) noise on near-singular H_ll
    #   blocks, amplified by 1/lambda_min on low-parallax landmarks,
    #   was measured to poison whole-window accept/reject on TPU.  The
    #   round-4 closed-form Cardano 3x3 eigensolver (ops/linalg.py::
    #   sym3x3_eigh) removed that failure: TPU-f32 joint solves now
    #   agree with CPU (pose agreement 1.3e-4 on the refined-map probe)
    #   and enabling joint landmark steps in the polish measured BETTER
    #   on forward scenes (corridor-fwd ATE 0.0336 -> 0.0282) and
    #   identical on lateral ones (the forwardness gate vetoes the
    #   polish there) — so the default is now False.  docs/parity.md
    #   deviation 8.
    polish_max_parallax_deg: float = 1.5  # hybrid: observability gate on
    #   the pose polish.  When the window's mean triangulation angle is
    #   HIGH, the map is well-observed and the photometric odometer is
    #   already at sub-LK accuracy — fusing pixel-level LK reprojection
    #   factors into the poses only adds noise (measured: lateral-sweep
    #   ATE 0.18 -> 0.36).  When it is LOW (forward motion), the
    #   odometer drifts along its unobservable directions and the
    #   multi-frame window constraints carry real information
    #   (measured: forward ATE 0.094 -> 0.058).  The polish therefore
    #   runs only below this mean-parallax threshold.
    polish_min_forwardness: float = 0.7  # hybrid: motion-direction gate
    #   on the pose polish, AND-combined with the parallax gate.
    #   Forwardness = the window's translation fraction along the
    #   optical axis (0 = pure lateral, 1 = pure forward).  The polish
    #   exists to repair the odometer's forward-drift mode; under
    #   LATERAL motion the odometer is well-conditioned and deep scenes
    #   can still sit under the parallax threshold (measured: the 720p
    #   plane-sweep bench scenario, ~1.3 deg mean parallax, regressed
    #   ATE 0.0048 -> 0.0149 with the parallax gate alone).  Sweep table
    #   in ACCURACY.md.  Set to 0 to disable (parallax gate only).
    polish_joint_turnover: float = 0.0  # hybrid: landmark-turnover gate
    #   on WHAT the fired polish does.  Turnover = (landmarks newly
    #   triangulated this keyframe) / (live landmarks).  Above the
    #   threshold the map is YOUNG (slots churn) and the joint polish
    #   starts from the RAW window landmarks — the refined map is not a
    #   long-lived asset, and joint-from-refined sits in the poses-
    #   fixed conditional minimum whose steps LM rejects (docs/parity.md
    #   deviation 9).  At/below it the map is MATURE (nothing newly
    #   triangulated: a fixed or fully-covered map) and the structure-
    #   refined landmarks ARE the asset: the polish runs MOTION-ONLY
    #   against them instead of discarding them.  Measured (r5):
    #   default 0.0 (mo only at exactly-zero turnover) improves BOTH
    #   regimes — corridor-noisymap hybrid ATE 0.0218 -> 0.0198 (final
    #   drift 2.1x better than structure) and corridor-fwd 0.1488 ->
    #   0.1371 (the zero-seed keyframes of a full map also prefer the
    #   refined-map polish); a looser 0.02 threshold regressed
    #   corridor-fwd to 0.1521.  Set to -1 to disable (always
    #   joint-from-raw, the r4 behavior).
    ba_lm_step_clip: float = 0.1  # per-BA-iteration landmark trust region,
    #                               fraction of distance to nearest camera
    ba_lm_eig_floor: float = 5e-3  # spectral observability cutoff on H_ll:
    #   eigen-directions below this fraction of lambda_max (an along-ray
    #   direction has lambda ~ (baseline/depth)^2 of the cross-ray ones)
    #   get NO update — depth refines only once baseline/depth >~ 7%.
    #   Tradeoff (measured, r5): the floor exists to stop ray-sliding on
    #   LIVE triangulated maps (whose depth error is proportional to
    #   observability), but it also refuses to correct an EXTERNALLY
    #   injected depth error until the window accumulates that baseline
    #   — on the fixed-noisymap scenario it capped point refinement at
    #   1.4x until opened to 1e-4 (map RMS 0.23 -> 0.029 at the same
    #   frame budget; ACCURACY.md noisymap rows).  Pipelines that load
    #   maps from external sources (NVM replay, noisy priors) should
    #   lower it.
    odo_prior: bool = True       # full mode: fuse the photometric
    #   odometer's relative poses as prior factors between consecutive
    #   keyframes, so joint BA can never drag a pose below pure-odometry
    #   quality when the window's structure is weak/young
    odo_sigma_t: float = 0.01    # odometry 1-sigma translation (world units)
    odo_sigma_r: float = 0.001   # odometry 1-sigma rotation (radians)
    odo_info_weighted: bool = False  # weight each odometry-prior factor
    #   by the photometric tracker's own converged GN Hessian divided by
    #   the measured residual variance — its Fisher information, per
    #   direction.  The prior is then exactly as stiff as the odometer
    #   was accurate: a lateral-motion odometer (strong in every
    #   direction) cannot be degraded by the pose polish, while a
    #   forward-motion one is weak along the optical axis and the
    #   window's multi-frame constraints own that direction.  Replaces
    #   the isotropic odo_sigma_t/odo_sigma_r weighting (which remains
    #   the fallback for factors without recorded information, e.g.
    #   bootstrap keyframes).
    odo_info_px_sigma: float = 0.3  # assumed 1-sigma of the window's LK
    #   reprojection observations (px).  BA residuals enter unweighted
    #   (unit-noise-pixel convention), so the photometric information is
    #   scaled by px_sigma^2 to share that convention.
    ba_debug: bool = False       # jax.debug.print per-keyframe BA costs
    #   (the engine analogue of the reference's verbosity=2 per-iteration
    #   prints, reference: odometer.cpp:416-417)
    ba_mesh: object = None       # jax.sharding.Mesh: run the window BA
    #   landmark-sharded over `ba_mesh_axis` (ba/distributed.py wrapper
    #   around the same ba_solve).  max_landmarks must divide evenly.
    ba_mesh_axis: str = "model"
    ba_temporal_mesh: object = None  # jax.sharding.Mesh: run the JOINT
    #   window-BA phase KEYFRAME-sharded over `ba_temporal_axis`
    #   (ba/temporal.py — the SP/CP strategy: O(L) psums + O(1) pose
    #   halos per GN step, independent of window length).  The long-
    #   window product path: `window` must divide evenly by the axis
    #   size.  The ring window is rolled to chronological order, the
    #   photometric odometry measurements become per-coefficient-
    #   weighted chain factors, and the hybrid polish gate applies
    #   unchanged.  Mutually exclusive with ba_mesh.  Limitation: the
    #   chain uses the ISOTROPIC odo_sigma_t/odo_sigma_r weights —
    #   odo_info_weighted is ignored on this path (warned at engine
    #   construction).
    ba_temporal_axis: str = "seq"
    ba_temporal_cg_iters: int = 48  # PCG iterations on the distributed
    #                                 reduced camera system per LM step


class VOState(NamedTuple):
    """Full engine state — a fixed-shape device pytree."""

    landmarks: jnp.ndarray    # (L, 3)
    lm_valid: jnp.ndarray     # (L,) bool
    lm_fail: jnp.ndarray      # (L,) int32 consecutive re-observation failures
    kf_poses: jnp.ndarray     # (K, 6)
    kf_valid: jnp.ndarray     # (K,) bool
    kf_obs: jnp.ndarray       # (K, L, 2) MEASURED pixel observations
    kf_obs_mask: jnp.ndarray  # (K, L) bool
    kf_rel: jnp.ndarray       # (K, 3, 4) measured relative pose from ring
    #                           slot (k-1)%K to slot k (photometric odometry)
    kf_rel_valid: jnp.ndarray  # (K,) bool
    kf_rel_info: jnp.ndarray  # (K, 6, 6) photometric Fisher information
    #                           of slot k's rel measurement, in pose-
    #                           coefficient coordinates (tracker GN
    #                           Hessian / sigma_I^2, scaled to the BA's
    #                           unit-noise-pixel convention); zeros when
    #                           not recorded (bootstrap) -> isotropic
    #                           fallback weighting
    kf_pyr: Tuple[PyramidLevel, ...]  # per level: fields (K, H_s, W_s)
    kf_ptr: jnp.ndarray       # () int32, newest keyframe slot
    cur_pose: jnp.ndarray     # (6,)
    frame_idx: jnp.ndarray    # () int32


# ---------------------------------------------------------------------------
# pyramid-ring helpers


def _index_pyr(kf_pyr, slot) -> Pyramid:
    """Select one keyframe's pyramid out of the (K, ...) stacks."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, slot, 0, keepdims=False),
        kf_pyr,
    )


def _update_pyr(kf_pyr, slot, pyr: Pyramid):
    """Write one pyramid into slot of the (K, ...) stacks."""
    return jax.tree.map(
        lambda stack, lvl: jax.lax.dynamic_update_index_in_dim(
            stack, lvl.astype(stack.dtype), slot, 0
        ),
        kf_pyr, tuple(pyr),
    )


def _row_set(arr, slot, row):
    return jax.lax.dynamic_update_index_in_dim(
        arr, row.astype(arr.dtype), slot, 0
    )


def _row_get(arr, slot):
    return jax.lax.dynamic_index_in_dim(arr, slot, 0, keepdims=False)


# ---------------------------------------------------------------------------
# fused device steps (module-level pure functions; closed over via jit
# lambdas in the engine constructor)


def _track_frame(state: VOState, pyr: Pyramid, cam: CameraPyramid,
                 cfgt: ICGNParams, want_info: bool = False,
                 px_sigma: float = 0.3):
    """IC-GN track the new frame against the newest keyframe's map.

    IC-GN semantics: the init pose must be the pose of the *reference
    image* — its patches are sampled at init-pose projections
    (reference: odometer.cpp:241-255; the chains in
    run_track_nposes.cpp:229-246 thread poses the same way).

    With ``want_info``, also returns the tracker's (6, 6) Fisher
    information at convergence: the finest-scale GN Hessian (caller
    coordinates) divided by the measured photometric residual variance
    at the final pose and scaled by ``px_sigma^2`` into the BA's
    unit-noise-pixel convention (VOConfig.odo_info_weighted).
    """
    fx, fy, cx, cy, swo, sho = cam.level(0)
    ref_pyr = _index_pyr(state.kf_pyr, state.kf_ptr)
    pose_ref = _row_get(state.kf_poses, state.kf_ptr)
    G = lie.se3_exp(pose_ref)
    uv = pose_ops.project_points(G, state.landmarks, fx, fy, cx, cy)
    uv = jnp.where(jnp.isfinite(uv), uv, -1.0)
    vis = pose_ops.in_frustum(uv, swo, sho) & state.lm_valid
    if not want_info:
        return track_pose(ref_pyr, pyr, state.landmarks, pose_ref, cam,
                          cfgt, point_mask=vis)
    p_new, aux = track_pose(ref_pyr, pyr, state.landmarks, pose_ref, cam,
                            cfgt, point_mask=vis, return_aux=True)

    # photometric residual variance at convergence (finest level): the
    # sigma_I^2 that turns the GN Hessian into Fisher information.
    # One extra patch-pair extraction per keyframe — negligible next to
    # the BA that consumes the result.
    from invcompcamtrack_tpu.image.patch import extract_patches
    from invcompcamtrack_tpu.solver.icgn import cam_level_padding

    G_new = lie.se3_exp(p_new)
    uv_r, Xc_r = pose_ops.project_points(G, state.landmarks, fx, fy, cx, cy,
                                         return_cam=True)
    uv_n, Xc_n = pose_ops.project_points(G_new, state.landmarks, fx, fy,
                                         cx, cy, return_cam=True)
    ok = (vis & pose_ops.in_frustum(uv_r, swo, sho) & (Xc_r[..., 2] > 0)
          & pose_ops.in_frustum(uv_n, swo, sho) & (Xc_n[..., 2] > 0)
          & jnp.all(jnp.isfinite(uv_r) & jnp.isfinite(uv_n), axis=-1))
    uv_r = jnp.where(ok[..., None], uv_r, 0.0)
    uv_n = jnp.where(ok[..., None], uv_n, 0.0)
    pad = cam_level_padding(cfgt)
    pr = extract_patches(ref_pyr[0].img, uv_r, cfgt.psz, pad,
                         patch_norm=cfgt.dopatchnorm)
    pn = extract_patches(pyr[0].img, uv_n, cfgt.psz, pad,
                         patch_norm=cfgt.dopatchnorm)
    d = (pr - pn) * ok[..., None, None].astype(pr.dtype)
    npix = cfgt.psz * cfgt.psz
    cnt = jnp.maximum(jnp.sum(ok) * npix, 1)
    sigma2_img = jnp.sum(d * d) / cnt
    # floor: exact synthetic renders can converge to ~0 residual, which
    # would claim infinite odometry information; 1e-4 of the image
    # dynamic range squared keeps the info finite without mattering on
    # real imagery
    rng_img = jnp.maximum(
        jnp.max(jnp.abs(ref_pyr[0].img)), jnp.asarray(1.0, pr.dtype))
    sigma2_img = jnp.maximum(sigma2_img, (1e-4 * rng_img) ** 2)
    info = aux.hessian * (px_sigma ** 2) / sigma2_img
    info = jnp.where(jnp.isfinite(info), info, 0.0)
    return p_new, info


class _ReobsOut(NamedTuple):
    """Stage boundary: re-observation results (promote part 1)."""

    xy_meas: jnp.ndarray   # (L, 2) measured LK positions in the new kf
    reobs: jnp.ndarray     # (L,) bool: landmark successfully re-observed
    lm_fail: jnp.ndarray   # (L,) int32 updated failure counters
    lm_valid: jnp.ndarray  # (L,) bool after lifecycle retirement


class _TriOut(NamedTuple):
    """Stage boundary: triangulation results (promote part 2)."""

    landmarks: jnp.ndarray     # (L, 3) with new seeds scattered in
    lm_valid: jnp.ndarray      # (L,) bool
    lm_fail: jnp.ndarray       # (L,) int32
    old_slot: jnp.ndarray      # () int32: founding partner keyframe slot
    old_obs: jnp.ndarray       # (L, 2) partner row incl. founding obs
    old_obs_mask: jnp.ndarray  # (L,)
    new_obs: jnp.ndarray       # (L, 2) new keyframe's observation row
    new_obs_mask: jnp.ndarray  # (L,)
    n_seeded: jnp.ndarray      # () int32: landmarks newly triangulated
    #                            this keyframe (the turnover statistic
    #                            behind polish_joint_turnover)


def _promote_reobserve(state: VOState, pyr: Pyramid, p_new,
                       cam: CameraPyramid, cfg: VOConfig) -> _ReobsOut:
    """Promote part 1: measured re-observation of existing landmarks.

    LK-track each landmark's patch from its measured position in the
    previous keyframe into the new keyframe, seeded at the predicted
    reprojection; the record is the MEASURED position, so BA anchors
    to pixels (the reference scores against measured correspondences
    the same way, run_test_OF_track.py:386-411).
    """
    cfgt = cfg.tracker
    fx, fy, cx, cy, swo, sho = cam.level(0)
    prev = state.kf_ptr
    prev_pyr = _index_pyr(state.kf_pyr, prev)
    prev_pose = _row_get(state.kf_poses, prev)
    prev_obs = _row_get(state.kf_obs, prev)
    prev_obs_mask = _row_get(state.kf_obs_mask, prev)
    G_prev = lie.se3_exp(prev_pose)
    G_new = lie.se3_exp(p_new)

    proj_prev = pose_ops.project_points(G_prev, state.landmarks, fx, fy, cx, cy)
    proj_new = pose_ops.project_points(G_new, state.landmarks, fx, fy, cx, cy)
    proj_prev = jnp.where(jnp.isfinite(proj_prev), proj_prev, 0.0)
    proj_new_s = jnp.where(jnp.isfinite(proj_new), proj_new, 0.0)
    start = jnp.where(prev_obs_mask[:, None], prev_obs, proj_prev)
    xy_meas, lk_ok = lk_forward_backward(
        prev_pyr, pyr, start, init_xy=proj_new_s,
        psz=cfg.lk_psz, num_levels=cfgt.num_levels,
    )
    vis_new = pose_ops.in_frustum(proj_new_s, swo, sho) & \
        jnp.all(jnp.isfinite(proj_new), axis=1)
    reproj_ok = jnp.linalg.norm(xy_meas - proj_new_s, axis=1) < cfg.reobs_gate_px
    reobs = (state.lm_valid & lk_ok & vis_new & reproj_ok
             & pose_ops.in_frustum(xy_meas, swo, sho))

    # landmark lifecycle: consecutive misses while expected visible
    # retire the landmark and free its slot
    expected = state.lm_valid & vis_new
    lm_fail = jnp.where(reobs, 0,
                        jnp.where(expected, state.lm_fail + 1, state.lm_fail))
    lm_valid = state.lm_valid & (lm_fail < cfg.max_obs_fail)
    return _ReobsOut(xy_meas=xy_meas, reobs=reobs, lm_fail=lm_fail,
                     lm_valid=lm_valid)


def _promote_triangulate(state: VOState, pyr: Pyramid, p_new,
                         cam: CameraPyramid, cfg: VOConfig,
                         ro: _ReobsOut) -> _TriOut:
    """Promote part 2: triangulate new landmarks from measured corner
    tracks into free slots."""
    cfgt = cfg.tracker
    K = cfg.window
    fx, fy, cx, cy, swo, sho = cam.level(0)
    fc2 = jnp.stack([fx, fy])
    cc2 = jnp.stack([cx, cy])
    prev = state.kf_ptr
    new_slot = (prev + 1) % K
    G_new = lie.se3_exp(p_new)
    lm_valid, lm_fail = ro.lm_valid, ro.lm_fail

    # Partner = the OLDEST valid keyframe in the window: the longest
    # available baseline.  Short-baseline 2-view triangulations have
    # depth errors ~ z^2/(f b) that corrupt tracking before BA can fix
    # them — the ray-angle gate below kills them instead.
    slots_all = jnp.arange(K)
    # exclude the slot being evicted this step: its observation row is
    # overwritten below, so it cannot found new landmarks
    ages_all = jnp.where(state.kf_valid & (slots_all != new_slot),
                         (prev - slots_all) % K, -1)
    old_slot = jnp.argmax(ages_all)
    old_pyr = _index_pyr(state.kf_pyr, old_slot)
    old_pose = _row_get(state.kf_poses, old_slot)
    old_obs = _row_get(state.kf_obs, old_slot)
    old_obs_mask = _row_get(state.kf_obs_mask, old_slot)
    G_old = lie.se3_exp(old_pose)

    interior = old_pyr[0].img[cfgt.psz:-cfgt.psz, cfgt.psz:-cfgt.psz]
    xy0, cvalid = shi_tomasi_corners(
        interior, max_corners=cfg.corners_per_kf, border=cfgt.psz
    )
    xy1, lk_okc = lk_forward_backward(
        old_pyr, pyr, xy0, psz=cfg.lk_psz, num_levels=cfgt.num_levels
    )
    parallax = jnp.linalg.norm(xy1 - xy0, axis=1)
    good = cvalid & lk_okc & (parallax > cfg.min_parallax_px)

    c_old = lie.camera_center(G_old)
    c_new = lie.camera_center(G_new)
    P0 = pose_ops.projection_matrix(fc2, cc2, G_old[:, :3], c_old)
    P1 = pose_ops.projection_matrix(fc2, cc2, G_new[:, :3], c_new)
    P = jnp.broadcast_to(jnp.stack([P0, P1]), (xy0.shape[0], 2, 3, 4))
    obs2 = jnp.stack([xy0, xy1], axis=1)
    X_new, _ = triangulate_dlt(P, obs2, R0=G_old[:, :3], c0=c_old)
    X_new, _ = triangulate_gn(P, obs2, jnp.nan_to_num(X_new), num_iters=3)
    depth_ok = (
        (pose_ops.transform_points(G_new, X_new)[..., 2] > 0.05)
        & (pose_ops.transform_points(G_old, X_new)[..., 2] > 0.05)
        & jnp.all(jnp.isfinite(X_new), axis=1)
    )
    # ray-angle gate: depth is only observable with enough baseline
    r0 = X_new - c_old
    r1 = X_new - c_new
    cosang = jnp.sum(r0 * r1, axis=1) / jnp.maximum(
        jnp.linalg.norm(r0, axis=1) * jnp.linalg.norm(r1, axis=1), 1e-12)
    ang_ok = cosang < jnp.cos(jnp.deg2rad(cfg.min_tri_angle_deg))
    good = good & depth_ok & ang_ok

    landmarks, lm_valid, seeded, take = _fill_slots(
        state.landmarks, lm_valid, X_new, good
    )
    lm_fail = jnp.where(seeded, 0, lm_fail)

    # seeded slots get their two MEASURED founding observations
    nc = xy0.shape[0]
    take_c = jnp.clip(take, 0, nc - 1)
    old_obs = jnp.where(seeded[:, None], jnp.take(xy0, take_c, axis=0), old_obs)
    old_obs_mask = old_obs_mask | seeded
    new_obs = jnp.where(seeded[:, None], jnp.take(xy1, take_c, axis=0),
                        ro.xy_meas)
    new_obs_mask = ro.reobs | seeded
    return _TriOut(landmarks=landmarks, lm_valid=lm_valid, lm_fail=lm_fail,
                   old_slot=old_slot, old_obs=old_obs,
                   old_obs_mask=old_obs_mask, new_obs=new_obs,
                   new_obs_mask=new_obs_mask,
                   n_seeded=jnp.sum(seeded).astype(jnp.int32))


def _joint_ba_temporal(cfg: VOConfig, prob: BAProblem, kf_rel,
                       kf_rel_valid, kf_valid, new_slot, motion_only):
    """Route the engine's joint window-BA phase to the keyframe-sharded
    temporal solver (ba/temporal.py) — the long-window SP product path.

    The ring window is rolled to CHRONOLOGICAL order (oldest keyframe at
    row 0), so ring-adjacent odometry measurements become array-adjacent
    chain factors.  The group-valued photometric odometry measurement
    ``rel_{k->k+1}`` is linearized into the chain's coefficient-space
    convention at the current pose (the framework's additive pose-update
    semantics, reference: pose.cpp:116-129):

        odom[k] = log(rel_{k->k+1} exp(p_k)) - p_k

    Translation/rotation coefficients carry distinct weights
    (1/odo_sigma_t^2, 1/odo_sigma_r^2) via the (K, 6) chain weights.
    """
    from invcompcamtrack_tpu.ba.temporal import (TemporalBAProblem,
                                                 temporal_ba_solve)

    K = prob.poses.shape[0]
    shift = -(new_slot + 1)

    def roll(a):
        return jnp.roll(a, shift, axis=0)

    poses_c, obs_c, mask_c = roll(prob.poses), roll(prob.obs), roll(prob.mask)
    fixed_c = roll(prob.fixed_pose_mask)
    rel_c, relv_c, kfv_c = roll(kf_rel), roll(kf_rel_valid), roll(kf_valid)

    # chain factor k couples chronological rows k -> k+1; its measured
    # relative group lives at rolled row k+1
    rel_next = jnp.roll(rel_c, -1, axis=0)
    pred = jax.vmap(
        lambda R, p: lie.se3_log(lie.se3_compose(R, lie.se3_exp(p)))
    )(rel_next, poses_c)
    odom = pred - poses_c
    f_valid = (jnp.roll(relv_c, -1, axis=0) & kfv_c
               & jnp.roll(kfv_c, -1, axis=0)
               & (jnp.arange(K) < K - 1))
    dtype = prob.poses.dtype
    w6 = jnp.concatenate([
        jnp.full((3,), (1.0 / cfg.odo_sigma_t) ** 2, dtype),
        jnp.full((3,), (1.0 / cfg.odo_sigma_r) ** 2, dtype)])
    w = jnp.where(f_valid[:, None], w6, 0.0)
    if not cfg.odo_prior:
        w = jnp.zeros_like(w)

    tprob = TemporalBAProblem(
        poses=poses_c, landmarks=prob.landmarks, obs=obs_c, mask=mask_c,
        fx=prob.fx, fy=prob.fy, cx=prob.cx, cy=prob.cy,
        fixed_pose_mask=fixed_c, odom=odom, odom_weight=w)
    p_c, lms, (e, e0) = temporal_ba_solve(
        tprob, cfg.ba_temporal_mesh, axis=cfg.ba_temporal_axis,
        num_iters=cfg.ba_iters, huber_delta=cfg.huber_px,
        cg_iters=cfg.ba_temporal_cg_iters, motion_only=motion_only)
    return jnp.roll(p_c, new_slot + 1, axis=0), lms, (e, e0)


def _promote_commit(state: VOState, pyr: Pyramid, p_new,
                    cam: CameraPyramid, cfg: VOConfig,
                    tri: _TriOut, rel_info=None) -> VOState:
    """Promote parts 3-4: ring write, gross-outlier gating, windowed BA,
    post-BA retirement."""
    K = cfg.window
    fx, fy, cx, cy, _, _ = cam.level(0)
    prev = state.kf_ptr
    new_slot = (prev + 1) % K
    prev_pose = _row_get(state.kf_poses, prev)
    G_prev = lie.se3_exp(prev_pose)
    G_new = lie.se3_exp(p_new)
    slots_all = jnp.arange(K)
    landmarks, lm_valid, lm_fail = tri.landmarks, tri.lm_valid, tri.lm_fail
    old_slot, old_obs, old_obs_mask = tri.old_slot, tri.old_obs, tri.old_obs_mask
    new_obs, new_obs_mask = tri.new_obs, tri.new_obs_mask

    # ---- (3) ring write: evict new_slot, record the keyframe ----
    kf_obs = _row_set(state.kf_obs, old_slot, old_obs)
    kf_obs = _row_set(kf_obs, new_slot, new_obs)
    kf_obs_mask = _row_set(state.kf_obs_mask, old_slot, old_obs_mask)
    kf_obs_mask = _row_set(kf_obs_mask, new_slot, new_obs_mask)
    kf_poses = _row_set(state.kf_poses, new_slot, p_new)
    kf_valid = state.kf_valid.at[new_slot].set(True)
    kf_pyr = _update_pyr(state.kf_pyr, new_slot, pyr)

    # record the photometric odometry measurement prev -> new (this is
    # the tracker's output BEFORE BA touches either pose; it anchors the
    # odometry-prior factors of the joint BA below)
    rel_new = lie.se3_compose(G_new, lie.se3_inverse(G_prev))
    kf_rel = _row_set(state.kf_rel, new_slot, rel_new)
    kf_rel_valid = state.kf_rel_valid.at[new_slot].set(True)
    kf_rel_info = _row_set(
        state.kf_rel_info, new_slot,
        rel_info if rel_info is not None
        else jnp.zeros((6, 6), state.kf_rel_info.dtype))

    # a landmark observed by NO keyframe left in the window is
    # unreachable for BA and for re-observation chains — retire it
    # (sliding-window analogue of dead-track compaction,
    # reference: misc_src/classoftrack.py:96-100)
    observed_any = jnp.any(kf_obs_mask & kf_valid[:, None], axis=0)
    lm_valid = lm_valid & observed_any

    # ---- (4) windowed BA on the measured observation grid ----
    if cfg.ba_mode == "structure":
        # structure-only refinement: every pose is held fixed; BA
        # polishes the LANDMARKS against the measured observation grid.
        # Pose accuracy comes from the photometric IC-GN odometer, which
        # on its own tracks at ~1e-4 error when the map is good — the
        # same division of labor as the reference, whose accuracy log
        # improves ~10x by refining *points*, not poses (reference:
        # misc_src/pose_tracking_acc.txt:1-57, triang.c entry points).
        fixed = jnp.ones((K,), bool)
    else:
        # joint-phase gauge ("full"/"hybrid"): the two OLDEST valid
        # keyframes anchor the window; every newer pose floats, so BA
        # can repair drift before a pose ages into the anchor set
        # (invalid slots count as fixed — diagonal boost in S)
        slots = jnp.arange(K)
        ages = jnp.where(kf_valid, (new_slot - slots) % K, -1)
        oldest2 = jax.lax.top_k(ages, 2)[0][-1]
        fixed = (~kf_valid) | (ages >= oldest2)
    mask = kf_obs_mask & kf_valid[:, None] & lm_valid[None, :]
    prob = BAProblem(
        poses=kf_poses, landmarks=landmarks, obs=kf_obs, mask=mask,
        fx=fx, fy=fy, cx=cx, cy=cy, fixed_pose_mask=fixed,
    )
    # hard residual gate: a measurement grossly inconsistent with the
    # current state is a correspondence failure, not noise — reject it
    # from the window permanently (Huber handles the mid-range).  This is
    # the RANSAC-style discard of the reference's verification loop
    # (reference: func_ransac_fitcameras_odom.m:47-57) applied per-obs.
    from invcompcamtrack_tpu.ba.window import ba_residuals as _ba_res
    res0, _ = _ba_res(prob)
    obs_ok = jnp.linalg.norm(res0, axis=-1) < cfg.ba_obs_gate_px
    kf_obs_mask = kf_obs_mask & (obs_ok | ~mask)
    mask = mask & obs_ok
    prob = prob._replace(mask=mask)
    do_ba = (jnp.sum(kf_valid) >= cfg.min_kf_for_ba) & \
        (jnp.sum(lm_valid) >= cfg.min_lm_for_ba)

    # observability statistic for the pose-polish gate: mean
    # triangulation angle of the live map between the window's longest
    # baseline (founding partner keyframe -> new keyframe)
    c_old_g = lie.camera_center(lie.se3_exp(_row_get(kf_poses, old_slot)))
    c_new_g = lie.camera_center(G_new)
    r0g = landmarks - c_old_g
    r1g = landmarks - c_new_g
    cosg = jnp.sum(r0g * r1g, axis=1) / jnp.maximum(
        jnp.linalg.norm(r0g, axis=1) * jnp.linalg.norm(r1g, axis=1), 1e-12)
    ang = jnp.arccos(jnp.clip(cosg, -1.0, 1.0))
    mean_parallax = jnp.sum(jnp.where(lm_valid, ang, 0.0)) / jnp.maximum(
        jnp.sum(lm_valid), 1)
    # motion-direction statistic for the forwardness gate: the window's
    # displacement-weighted translation fraction along the optical axis
    # (camera-frame z of each keyframe-to-keyframe center displacement)
    kf_centers = jax.vmap(
        lambda p: lie.camera_center(lie.se3_exp(p)))(kf_poses)   # (K, 3)
    dc = kf_centers - jnp.roll(kf_centers, 1, axis=0)            # (K, 3)
    R_k = jax.vmap(lambda p: lie.se3_exp(p)[:, :3])(kf_poses)
    dc_cam = jnp.einsum("kij,kj->ki", R_k, dc)
    step_len = jnp.linalg.norm(dc, axis=1)
    f_ok = (kf_valid & jnp.roll(kf_valid, 1)
            & (slots_all != (new_slot + 1) % K))   # skip the ring wrap
    wsum = jnp.sum(jnp.where(f_ok, step_len, 0.0))
    forwardness = jnp.sum(
        jnp.where(f_ok, jnp.abs(dc_cam[:, 2]), 0.0)) / jnp.maximum(
        wsum, 1e-12)
    polish_on = (
        (mean_parallax < jnp.deg2rad(cfg.polish_max_parallax_deg))
        & (forwardness >= cfg.polish_min_forwardness)
    )

    odo = None
    if cfg.ba_mode in ("full", "hybrid") and cfg.odo_prior:
        # factor k constrains ring slots (k-1)%K -> k.  After the ring
        # wraps, the OLDEST slot's predecessor-in-slot-order is the
        # NEWEST slot — that wraparound factor is stale by construction
        # and must be masked out.
        pred_valid = jnp.roll(kf_valid, 1)
        oldest = (new_slot + 1) % K
        info_sqrt = None
        if cfg.odo_info_weighted:
            # per-factor FULL information from the tracker's converged
            # Hessian (kf_rel_info, pose-coefficient coords of slot k).
            # The factor residual lives in discrepancy coordinates
            # r_u(D), D = G_k G_{k-1}^{-1} rel^{-1}; information
            # transforms by the inverse residual Jacobian A = dr_u/dp_k
            # (holding p_{k-1}): W_r = A^{-T} W_p A^{-1}.
            dt = kf_rel.dtype
            I6 = jnp.eye(6, dtype=dt)
            W_iso = jnp.diag(jnp.concatenate([
                jnp.full((3,), (1.0 / cfg.odo_sigma_t) ** 2, dt),
                jnp.full((3,), (1.0 / cfg.odo_sigma_r) ** 2, dt)]))

            def _fsqrt(rel_k, p_k, p_prev, W_p):
                def r_of_pk(pk):
                    Gk = lie.se3_exp(pk)
                    D = lie.se3_compose(
                        lie.se3_compose(Gk,
                                        lie.se3_inverse(lie.se3_exp(p_prev))),
                        lie.se3_inverse(rel_k))
                    R = D[:, :3]
                    rw = 0.5 * jnp.stack([R[2, 1] - R[1, 2],
                                          R[0, 2] - R[2, 0],
                                          R[1, 0] - R[0, 1]])
                    return jnp.concatenate([D[:, 3], rw])

                A = jax.jacfwd(r_of_pk)(p_k)
                Ainv = jnp.linalg.solve(A + 1e-8 * I6, I6)
                Wp_s = 0.5 * (W_p + W_p.T)
                W_r = Ainv.T @ Wp_s @ Ainv
                W_r = 0.5 * (W_r + W_r.T)
                # SUM with the isotropic prior, don't replace it: the
                # photometric Hessian measures the odometer's NOISE but
                # not its correlated model error (LK bias under forward
                # flow deformation), so along weakly-observed axes the
                # measured info can approach zero and let the window's
                # overconfident independent-noise LK factors drag the
                # pose (measured: corridor-fwd ATE 0.051 -> 0.071 with
                # replacement).  The iso term is the correlated-error
                # floor; the photometric term adds the per-direction
                # stiffness that protects well-measured axes (measured:
                # plane-sweep ATE restored 0.0233 -> 0.0167).
                W = W_iso + jnp.where(jnp.trace(Wp_s) > 0, W_r, 0.0)
                ridge = 1e-6 * jnp.trace(W) / 6.0 + 1e-12
                Lc = jnp.linalg.cholesky(W + ridge * I6)
                S = jnp.swapaxes(Lc, -1, -2)  # W = S^T S
                return jnp.where(jnp.all(jnp.isfinite(S)), S,
                                 jnp.sqrt(W_iso))

            info_sqrt = jax.vmap(_fsqrt)(
                kf_rel, kf_poses, jnp.roll(kf_poses, 1, axis=0),
                kf_rel_info)
        odo = OdoFactors(
            rel=kf_rel,
            mask=(kf_rel_valid & kf_valid & pred_valid
                  & (slots_all != oldest)),
            w_t=jnp.asarray(1.0 / cfg.odo_sigma_t, kf_rel.dtype),
            w_r=jnp.asarray(1.0 / cfg.odo_sigma_r, kf_rel.dtype),
            info_sqrt=info_sqrt,
        )

    if cfg.ba_mesh is not None:
        # landmark-sharded window BA over the configured mesh — the SAME
        # ba_solve, run inside shard_map with psum'd pose reductions
        # (ba/distributed.py); everything else in the step is replicated
        from invcompcamtrack_tpu.ba.distributed import ba_solve_sharded

        def _ba(pr, **kw):
            return ba_solve_sharded(pr, cfg.ba_mesh, axis=cfg.ba_mesh_axis,
                                    **kw)
    else:
        _ba = ba_solve

    def run_ba(_):
        # low-parallax guards (forward motion makes H_ll near-singular
        # along the rays): per-iteration trust region on the landmark
        # step, damping floor, and — when poses are held fixed (the
        # structure problem is separable) — exact per-landmark
        # accept/reject.
        poses, lms = prob.poses, prob.landmarks
        if cfg.ba_mode in ("structure", "hybrid"):
            # structure phase: all poses fixed, refine the map only
            n_s = cfg.ba_struct_iters if cfg.ba_mode == "hybrid" \
                else cfg.ba_iters
            _, lms, (es, es0) = _ba(
                prob._replace(fixed_pose_mask=jnp.ones((K,), bool)),
                num_iters=n_s, huber_delta=cfg.huber_px,
                lm_step_clip=cfg.ba_lm_step_clip,
                per_landmark_accept=True,
                damp_min=1e-5,
                lm_eig_floor=cfg.ba_lm_eig_floor,
            )
            if cfg.ba_debug:
                jax.debug.print("BA kf={k} struct {a:.5f} -> {b:.5f}",
                                k=state.frame_idx, a=es0, b=es)
        if cfg.ba_mode in ("full", "hybrid"):
            # joint phase: odometry-prior fused; in hybrid the landmarks
            # stay frozen (pose polish) unless configured otherwise.
            # The joint solve starts from the RAW window landmarks, NOT
            # the structure-phase output: the structure pre-pass drives
            # the window to its poses-fixed conditional minimum, where
            # the joint LM's first steps are cost-flat and get rejected
            # — measured on corridor-fwd (200 fr): joint-from-refined
            # collapses hybrid to structure exactly (ATE 0.2071) while
            # joint-from-raw reaches full's 0.1488.  Hybrid is therefore
            # gate ? joint-from-raw : structure.
            mo = cfg.ba_mode == "hybrid" and cfg.ba_joint_motion_only
            # motion-only polish: landmarks are frozen, so the flat-
            # valley rejection cannot occur — polish against the
            # REFINED map (the better pose target).
            joint_prob = prob._replace(landmarks=lms) if mo else prob
            if (cfg.ba_mode == "hybrid" and not mo
                    and cfg.polish_joint_turnover >= 0.0):
                # turnover routing (polish_joint_turnover): a MATURE map
                # (no slot churn) keeps the structure-refined landmarks
                # and polishes motion-only against them; a YOUNG map
                # runs joint-from-raw.  `mo` becomes a TRACED gate — the
                # solvers zero the landmark step under it.
                turnover = tri.n_seeded.astype(lms.dtype) / jnp.maximum(
                    jnp.sum(lm_valid).astype(lms.dtype), 1.0)
                mo = turnover <= cfg.polish_joint_turnover
                joint_prob = prob._replace(
                    landmarks=jnp.where(mo, lms, prob.landmarks))
            if cfg.ba_temporal_mesh is not None:
                # long-window product path: keyframe-sharded SP solve
                poses_j, lms_j, (ej, ej0) = _joint_ba_temporal(
                    cfg, joint_prob, kf_rel,
                    kf_rel_valid, kf_valid, new_slot, mo)
            else:
                poses_j, lms_j, (ej, ej0) = _ba(
                    joint_prob,
                    num_iters=cfg.ba_iters, huber_delta=cfg.huber_px,
                    lm_step_clip=cfg.ba_lm_step_clip,
                    per_landmark_accept=False,
                    damp_min=1e-5,
                    lm_eig_floor=cfg.ba_lm_eig_floor,
                    odo=odo,
                    motion_only=mo,
                )
            if cfg.ba_mode == "hybrid":
                # observability gate (see polish_max_parallax_deg)
                poses = jnp.where(polish_on, poses_j, poses)
                lms = jnp.where(polish_on, lms_j, lms)
            else:
                poses, lms = poses_j, lms_j
            if cfg.ba_debug:
                jax.debug.print(
                    "BA kf={k} joint {a:.5f} -> {b:.5f} dpose={d:.2e}",
                    k=state.frame_idx, a=ej0, b=ej,
                    d=jnp.abs(poses - prob.poses).max())
        return poses, lms

    kf_poses, landmarks = jax.lax.cond(
        do_ba, run_ba, lambda _: (kf_poses, landmarks), None
    )
    cur_pose = _row_get(kf_poses, new_slot)
    # post-BA sanity: a landmark pushed behind the newest camera is
    # geometrically dead — retire it (chirality NaN-out analogue,
    # reference: func_util_geom.py:575-577)
    z_cur = pose_ops.transform_points(lie.se3_exp(cur_pose), landmarks)[..., 2]
    lm_valid = lm_valid & (z_cur > 0.01)

    return state._replace(
        landmarks=landmarks, lm_valid=lm_valid, lm_fail=lm_fail,
        kf_poses=kf_poses, kf_valid=kf_valid,
        kf_obs=kf_obs, kf_obs_mask=kf_obs_mask, kf_pyr=kf_pyr,
        kf_rel=kf_rel, kf_rel_valid=kf_rel_valid, kf_rel_info=kf_rel_info,
        kf_ptr=new_slot, cur_pose=cur_pose,
    )


def _promote(state: VOState, pyr: Pyramid, p_new, cam: CameraPyramid,
             cfg: VOConfig, rel_info=None) -> VOState:
    """Fused keyframe promotion: measured re-observation of the map,
    corner triangulation into free slots, ring eviction, windowed BA.

    Composed of three sub-stages so the pipeline-parallel engine
    (parallel/vo_pipeline.py) can place them on separate devices while
    staying parity-by-construction with this fused path."""
    ro = _promote_reobserve(state, pyr, p_new, cam, cfg)
    tri = _promote_triangulate(state, pyr, p_new, cam, cfg, ro)
    return _promote_commit(state, pyr, p_new, cam, cfg, tri,
                           rel_info=rel_info)


def _track_step(state: VOState, img, cam: CameraPyramid, cfg: VOConfig):
    """One fused non-keyframe frame: pyramid + track in one program."""
    pyr = build_pyramid(img, cfg.tracker.num_levels, cfg.tracker.psz)
    p_new = _track_frame(state, pyr, cam, cfg.tracker)
    state = state._replace(cur_pose=p_new, frame_idx=state.frame_idx + 1)
    return state, p_new


def _keyframe_step(state: VOState, img, cam: CameraPyramid, cfg: VOConfig):
    """One fused keyframe frame: pyramid + track + promote + BA."""
    pyr = build_pyramid(img, cfg.tracker.num_levels, cfg.tracker.psz)
    if cfg.odo_info_weighted:
        p_new, rel_info = _track_frame(state, pyr, cam, cfg.tracker,
                                       want_info=True,
                                       px_sigma=cfg.odo_info_px_sigma)
    else:
        p_new, rel_info = _track_frame(state, pyr, cam, cfg.tracker), None
    state = _promote(state, pyr, p_new, cam, cfg, rel_info=rel_info)
    state = state._replace(frame_idx=state.frame_idx + 1)
    return state, state.cur_pose


def _promote_step(state: VOState, img, pose, cam: CameraPyramid, cfg: VOConfig):
    """Promote a frame with an externally-given pose (bootstrap path)."""
    pyr = build_pyramid(img, cfg.tracker.num_levels, cfg.tracker.psz)
    state = _promote(state, pyr, pose, cam, cfg)
    state = state._replace(frame_idx=state.frame_idx + 1)
    return state, state.cur_pose


def _run_periods(state: VOState, frames, cam: CameraPyramid, cfg: VOConfig):
    """lax.scan over keyframe periods — frames (P, stride, H, W) where
    index 0 of each period is the keyframe frame.  One device dispatch
    for the whole chunk."""

    def period(st, imgs):
        st, p0 = _keyframe_step(st, imgs[0], cam, cfg)
        ps = [p0]
        for j in range(1, cfg.keyframe_stride):
            st, pj = _track_step(st, imgs[j], cam, cfg)
            ps.append(pj)
        return st, jnp.stack(ps)

    state, poses = jax.lax.scan(period, state, frames)
    return state, poses.reshape(-1, 6)


def _fill_slots(landmarks, lm_valid, candidates, cand_valid):
    """Scatter valid candidates into free landmark slots (prefix-sum slot
    assignment, same pattern as the track table).

    Returns (landmarks, lm_valid, seeded (L,) bool, take (L,) int32 —
    the candidate index written into each seeded slot, -1 elsewhere).
    """
    L = landmarks.shape[0]
    K = candidates.shape[0]
    free = ~lm_valid
    slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    cand_rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    cand_for_rank = jnp.full((L,), -1, jnp.int32)
    scatter_idx = jnp.where(cand_valid, cand_rank, L)
    cand_for_rank = cand_for_rank.at[scatter_idx].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop")
    take = cand_for_rank[jnp.clip(slot_rank, 0, L - 1)]
    seeded = free & (take >= 0)
    take = jnp.where(seeded, take, -1)
    seed_X = jnp.take(candidates, jnp.clip(take, 0, K - 1), axis=0)
    landmarks = jnp.where(seeded[:, None], seed_X.astype(landmarks.dtype), landmarks)
    return landmarks, lm_valid | seeded, seeded, take


class VisualOdometryBatch:
    """Multi-stream engine: S independent VO streams advanced by ONE
    vmapped device program — the chip-filling throughput mode
    (frames/s/chip is the north-star metric; a single 720p stream
    leaves the chip mostly idle between keyframe programs).

    All streams share one camera/config (one compilation); states are
    stacked leaf-wise into a leading stream axis.  ``lax.cond`` under
    vmap executes both branches, so the do-BA gate becomes a select —
    streams that gate BA off still pay its FLOPs (they are batched with
    streams that don't; the chip was idle anyway).
    """

    def __init__(self, engines: "list[VisualOdometry]"):
        if not engines:
            raise ValueError("need at least one bootstrapped engine")
        cfg0 = engines[0].cfg
        for e in engines[1:]:
            if e.cfg is not cfg0 and e.cfg != cfg0:
                raise ValueError("streams must share one VOConfig")
            if e.state is None:
                raise ValueError("bootstrap every engine first")
        self.engines = engines
        cam = engines[0].cam
        # under vmap Mosaic double-buffers the per-stream VMEM planes,
        # so the fused dual-gather kernel (two resident planes) exceeds
        # VMEM at large frames where a single stream fits — force the
        # split-launch path (one plane per kernel) when the fused pair
        # would not fit twice.  Results are identical (same taps).
        tr = cfg0.tracker
        if not tr.gather_split:
            from invcompcamtrack_tpu.ops.patch_pallas import (
                dual_gather_fits_vmapped)
            H0, W0 = engines[0].state.kf_pyr[0].img.shape[-2:]
            if not dual_gather_fits_vmapped(int(H0), int(W0),
                                            tr.window_size, psz=tr.psz):
                cfg0 = dataclasses.replace(
                    cfg0, tracker=dataclasses.replace(tr, gather_split=True))
        self.cfg = cfg0
        self.states = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[e.state for e in engines]
        )
        self._jit_run = jax.jit(jax.vmap(
            lambda st, fr: _run_periods(st, fr, cam, cfg0)
        ))
        self._frame_idx = engines[0]._frame_idx

    @property
    def n_streams(self) -> int:
        return len(self.engines)

    def run_frames(self, images) -> np.ndarray:
        """images: (S, T, H, W), T a multiple of keyframe_stride and the
        cadence aligned (same contract as VisualOdometry.run_frames).
        ONE device dispatch advances every stream; returns (S, T, 6)."""
        stride = self.cfg.keyframe_stride
        S, T = images.shape[:2]
        if S != self.n_streams:
            raise ValueError(f"{S} image streams != {self.n_streams}")
        if T % stride != 0 or self._frame_idx % stride != 0:
            raise ValueError("chunk must align with the keyframe cadence")
        frames = jnp.asarray(images, self.engines[0].dtype).reshape(
            S, T // stride, stride, *images.shape[2:]
        )
        self.states, poses = self._jit_run(self.states, frames)
        self._frame_idx += T
        return np.asarray(poses)

    def state_of(self, s: int) -> VOState:
        return jax.tree.map(lambda a: a[s], self.states)


def make_empty_state(cfg: VOConfig, wh, dtype=jnp.float32) -> VOState:
    """A zeroed fixed-shape VOState for image size ``wh`` = (W, H)."""
    L = cfg.max_landmarks
    K = cfg.window
    cfgt = cfg.tracker
    zero_img = jnp.zeros((int(wh[1]), int(wh[0])), dtype)
    pyr0 = build_pyramid(zero_img, cfgt.num_levels, cfgt.psz)
    kf_pyr = jax.tree.map(
        lambda a: jnp.zeros((K,) + a.shape, a.dtype), tuple(pyr0)
    )
    return VOState(
        landmarks=jnp.zeros((L, 3), dtype),
        lm_valid=jnp.zeros((L,), bool),
        lm_fail=jnp.zeros((L,), jnp.int32),
        kf_poses=jnp.zeros((K, 6), dtype),
        kf_valid=jnp.zeros((K,), bool),
        kf_obs=jnp.zeros((K, L, 2), dtype),
        kf_obs_mask=jnp.zeros((K, L), bool),
        kf_rel=jnp.broadcast_to(
            jnp.eye(3, 4, dtype=dtype), (K, 3, 4)
        ).copy(),
        kf_rel_valid=jnp.zeros((K,), bool),
        kf_rel_info=jnp.zeros((K, 6, 6), dtype),
        kf_pyr=kf_pyr,
        kf_ptr=jnp.zeros((), jnp.int32),
        cur_pose=jnp.zeros((6,), dtype),
        frame_idx=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------


class VisualOdometry:
    """Stateful host facade; one jitted device program per frame (and one
    per *chunk* via :meth:`run_frames`)."""

    def __init__(self, cam: CameraPyramid, fc, cc, cfg: VOConfig | None = None,
                 dtype=jnp.float32):
        self.cam = cam
        self.cfg = cfg or VOConfig()
        self.fc = fc
        self.cc = cc
        self.dtype = dtype
        self.state: Optional[VOState] = None
        self.trajectory: list[np.ndarray] = []
        self._frame_idx = 0  # host mirror for the keyframe cadence
        if self.cfg.odo_info_weighted and \
                self.cfg.ba_temporal_mesh is not None:
            # the temporal (keyframe-sharded) chain carries isotropic
            # per-coefficient weights only; the per-factor photometric
            # Fisher information is not threaded through it yet (ADVICE
            # r4) — warn instead of silently dropping the option
            import warnings
            warnings.warn(
                "odo_info_weighted is ignored on the ba_temporal_mesh "
                "path: the temporal chain uses the isotropic "
                "odo_sigma_t/odo_sigma_r weights (per-factor (K, 6) "
                "information weighting is not implemented there)",
                RuntimeWarning, stacklevel=2)

        c, cf = cam, self.cfg
        self._jit_pyr = jax.jit(
            lambda img: build_pyramid(img, cf.tracker.num_levels, cf.tracker.psz)
        )
        self._jit_track = jax.jit(lambda st, img: _track_step(st, img, c, cf))
        self._jit_kf = jax.jit(lambda st, img: _keyframe_step(st, img, c, cf))
        self._jit_promote = jax.jit(
            lambda st, img, p: _promote_step(st, img, p, c, cf)
        )
        self._jit_run = jax.jit(lambda st, fr: _run_periods(st, fr, c, cf))

    # ---------- state views (stable public attribute API) ----------

    @property
    def landmarks(self):
        return self.state.landmarks

    @property
    def lm_valid(self):
        return self.state.lm_valid

    @property
    def kf_poses(self):
        return self.state.kf_poses

    @property
    def kf_valid(self):
        return np.asarray(self.state.kf_valid)

    @property
    def kf_obs(self):
        return self.state.kf_obs

    @property
    def kf_obs_mask(self):
        return self.state.kf_obs_mask

    @property
    def cur_pose(self):
        return self.state.cur_pose

    @property
    def frame_idx(self) -> int:
        return self._frame_idx

    @property
    def _last_kf_slot(self) -> int:
        return int(self.state.kf_ptr)

    # ---------- internals ----------

    def _empty_state(self, wh) -> VOState:
        return make_empty_state(self.cfg, wh, self.dtype)

    def _append_center(self, pose):
        c = np.asarray(lie.camera_center(lie.se3_exp(pose)))
        self.trajectory.append(c)

    def _append_centers_batch(self, poses):
        """One device dispatch + one d2h pull for a whole (T, 6) pose
        chunk.  Per-pose pulls cost a full host round-trip each (tens of
        ms through a remote-device tunnel), which dominated chunked
        throughput before batching."""
        cs = np.asarray(lie.camera_center(lie.se3_exp(poses)))
        self.trajectory.extend(list(cs))

    # ---------- public API ----------

    def bootstrap_from_images(self, img0, img1, key=None, scale: float = 1.0,
                              num_matches: int = 512):
        """GT-free initialization: corners + fb-LK matches -> essential
        matrix -> relative pose + triangulated seeds (sfm/twoview.py).
        Monocular scale is fixed to ``scale`` * unit baseline.
        Seed observations are the MEASURED match positions.
        Returns the number of seed landmarks."""
        from invcompcamtrack_tpu.sfm.twoview import initialize_two_view

        if key is None:
            key = jax.random.PRNGKey(0)
        cfgt = self.cfg.tracker
        pyr0 = self._jit_pyr(jnp.asarray(img0, self.dtype))
        pyr1 = self._jit_pyr(jnp.asarray(img1, self.dtype))
        xy0, cvalid = shi_tomasi_corners(
            pyr0[0].img[cfgt.psz:-cfgt.psz, cfgt.psz:-cfgt.psz],
            max_corners=num_matches, border=cfgt.psz,
        )
        xy1, ok = lk_forward_backward(pyr0, pyr1, xy0, psz=self.cfg.lk_psz,
                                      num_levels=cfgt.num_levels)
        fc = jnp.asarray(self.fc, self.dtype)
        cc = jnp.asarray(self.cc, self.dtype)
        res = initialize_two_view(
            key, (xy0 - cc) / fc, (xy1 - cc) / fc, cvalid & ok
        )
        G1 = lie.se3_exp(res.pose1)
        c1 = lie.camera_center(G1) * scale
        t1 = -jnp.einsum("ij,j->i", G1[:, :3], c1)
        pose1 = lie.se3_log(jnp.concatenate([G1[:, :3], t1[:, None]], axis=1))
        valid = np.asarray(res.valid)
        lms = np.asarray(res.landmarks)[valid] * scale
        self.bootstrap(img0, img1, np.zeros(6), np.asarray(pose1), lms,
                       obs0=np.asarray(xy0)[valid])
        return int(valid.sum())

    def bootstrap(self, img0, img1, pose0, pose1, points3d, valid=None,
                  obs0=None):
        """Initialize with two known poses + landmark seeds (from GT,
        stereo, or two-view SfM done by the caller).

        ``obs0`` optionally carries the measured pixel positions of the
        seeds in frame 0 (e.g. the match coordinates that produced
        them); without it the seeds' frame-0 observations fall back to
        their reprojections (the best available anchor for GT seeds).
        Frame-1 observations are always MEASURED (LK from frame 0).
        """
        L = self.cfg.max_landmarks
        pts = np.zeros((L, 3), np.float32)
        msk = np.zeros((L,), bool)
        n = min(len(points3d), L)
        pts[:n] = np.asarray(points3d)[:n]
        msk[:n] = True if valid is None else np.asarray(valid)[:n]

        state = self._empty_state(self._wh_from_image(img0))
        state = state._replace(
            landmarks=jnp.asarray(pts, self.dtype),
            lm_valid=jnp.asarray(msk),
        )

        pose0 = jnp.asarray(pose0, self.dtype)
        pose1 = jnp.asarray(pose1, self.dtype)
        pyr0 = self._jit_pyr(jnp.asarray(img0, self.dtype))

        # ---- keyframe 0 (slot 0) ----
        fx, fy, cx, cy, swo, sho = self.cam.level(0)
        G0 = lie.se3_exp(pose0)
        if obs0 is not None:
            uv0 = np.zeros((L, 2), np.float32)
            uv0[:n] = np.asarray(obs0)[:n]
            uv0 = jnp.asarray(uv0, self.dtype)
        else:
            uv0 = pose_ops.project_points(G0, state.landmarks, fx, fy, cx, cy)
            uv0 = jnp.where(jnp.isfinite(uv0), uv0, -1.0)
        mask0 = state.lm_valid & pose_ops.in_frustum(uv0, swo, sho)
        state = state._replace(
            kf_poses=state.kf_poses.at[0].set(pose0),
            kf_valid=state.kf_valid.at[0].set(True),
            kf_obs=state.kf_obs.at[0].set(uv0),
            kf_obs_mask=state.kf_obs_mask.at[0].set(mask0),
            kf_pyr=_update_pyr(state.kf_pyr, jnp.int32(0), pyr0),
            kf_ptr=jnp.zeros((), jnp.int32),
            cur_pose=pose0,
            frame_idx=jnp.ones((), jnp.int32),
        )
        self.state = state
        self._append_center(pose0)

        # ---- keyframe 1: measured promote with the given pose ----
        self.state, _ = self._jit_promote(
            self.state, jnp.asarray(img1, self.dtype), pose1
        )
        self._append_center(self.state.cur_pose)
        self._frame_idx = 2

    def _wh_from_image(self, img):
        h, w = np.asarray(img).shape[-2:]
        return (w, h)

    def process_frame(self, img) -> np.ndarray:
        """Track one new frame (ONE device dispatch); returns the (6,)
        pose estimate."""
        img = jnp.asarray(img, self.dtype)
        if self._frame_idx % self.cfg.keyframe_stride == 0:
            self.state, pose = self._jit_kf(self.state, img)
        else:
            self.state, pose = self._jit_track(self.state, img)
        self._frame_idx += 1
        self._append_center(pose)
        return np.asarray(pose)

    def run_frames(self, images) -> np.ndarray:
        """Process a chunk of frames in ONE device dispatch (scan over
        keyframe periods).  ``images``: (T, H, W) with T a multiple of
        ``keyframe_stride``, and the current frame index aligned so the
        first frame is a keyframe frame.  Returns the (T, 6) poses."""
        stride = self.cfg.keyframe_stride
        T = images.shape[0]
        if T % stride != 0:
            raise ValueError(f"chunk length {T} not a multiple of {stride}")
        if self._frame_idx % stride != 0:
            raise ValueError("chunk start must align with the keyframe cadence")
        frames = jnp.asarray(images, self.dtype).reshape(
            T // stride, stride, *images.shape[1:]
        )
        self.state, poses = self._jit_run(self.state, frames)
        self._frame_idx += T
        self._append_centers_batch(poses)
        return np.asarray(poses)
