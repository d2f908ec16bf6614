"""Multi-frame forward/backward pose-chain tracking + NCC verification.

TPU re-design of the reference's ``run_track_nposes`` binary
(reference: run_track_nposes.cpp:133-365) — the odometry-verification
stage of RANSAC pose fitting.  The reference loops over pose samples
sequentially (``for sid``, :193); here the sample axis is a device batch
through ``track_pose_batch`` for every frame pair:

per sample: start from its hypothesis pose, chain-track forward
``fb_frames[1]`` pairs and backward ``fb_frames[0]`` pairs (the pose
threads through, :229-265), then score every sample point by NCC between
mean-normalized unit-norm patches at level ``lv_l`` extracted at the
(back, reference, forward) reprojections, weighted by the squared chain
lengths (:271-352).

The per-sample inlier subsets become fixed-shape boolean masks over the
shared correspondence set (:207-213's gather, made static).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core import pose as pose_ops
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.patch import extract_patches
from invcompcamtrack_tpu.image.pyramid import Pyramid
from invcompcamtrack_tpu.match.ncc import patch_correlation_score
from invcompcamtrack_tpu.solver.icgn import track_pose_batch


class ChainResult(NamedTuple):
    pose_tracks: jnp.ndarray    # (S, M, 6) poses per image (M = fb0+fb1+1)
    correlations: jnp.ndarray   # (S, N) per-point scores (-1 = invalid)
    mean_corr: jnp.ndarray      # (S,) masked mean over each sample's inliers


def _project_lvl(p, Xn, cam: CameraPyramid, lvl: int):
    fx, fy, cx, cy, _, _ = cam.level(lvl)
    return pose_ops.project_points(lie.se3_exp(p), Xn, fx, fy, cx, cy)


def _strict_inside(uv, swo, sho):
    """The NCC scoring path uses a strictly-interior check
    (reference: run_track_nposes.cpp:292: > 0 and < swo)."""
    return (uv[..., 0] > 0) & (uv[..., 1] > 0) & (uv[..., 0] < swo) & (uv[..., 1] < sho)


def track_nposes(pyramids: Sequence[Pyramid], poses: jnp.ndarray,
                 pt3d: jnp.ndarray, inlier_masks: jnp.ndarray,
                 cam: CameraPyramid, cfg: ICGNParams,
                 fb_frames=(1, 1)) -> ChainResult:
    """pyramids: M = fb0+fb1+1 image pyramids, index fb0 = reference frame.
    poses: (S, 6) hypothesis poses (world->cam of the reference frame).
    pt3d: (N, 3) shared correspondence set; inlier_masks: (S, N).
    """
    fb0, fb1 = int(fb_frames[0]), int(fb_frames[1])
    S = poses.shape[0]
    N = pt3d.shape[0]
    Xb = jnp.broadcast_to(pt3d, (S,) + pt3d.shape)

    tracks = [None] * (fb0 + fb1 + 1)
    tracks[fb0] = poses

    # forward chain (reference: run_track_nposes.cpp:229-246)
    p_cur = poses
    for fr in range(fb1):
        fr_t = fr + fb0
        p_cur = track_pose_batch(
            pyramids[fr_t], pyramids[fr_t + 1], Xb, p_cur, cam, cfg,
            point_mask=inlier_masks,
        )
        tracks[fr_t + 1] = p_cur
    p_fwd_end = p_cur

    # backward chain (reference: :249-265)
    p_cur = poses
    for fr in range(fb0):
        fr_t = fb0 - fr
        p_cur = track_pose_batch(
            pyramids[fr_t], pyramids[fr_t - 1], Xb, p_cur, cam, cfg,
            point_mask=inlier_masks,
        )
        tracks[fr_t - 1] = p_cur
    p_back_end = p_cur

    pose_tracks = jnp.stack(tracks, axis=1)  # (S, M, 6)

    # --- NCC scoring at level lv_l (reference: :271-352) ---
    lvl = cfg.lv_l
    _, _, _, _, swo, sho = cam.level(lvl)

    def normalize_for(p, mask):
        if cfg.donorm:
            Xn, mean, varval = pose_ops.normalize_points(pt3d, mask=mask)
            return Xn, pose_ops.normalize_pose(p, mean, varval)
        return pt3d, p

    def reproject_batch(p_batch):
        def one(p, mask):
            Xn, pn = normalize_for(p, mask)
            return _project_lvl(pn, Xn, cam, lvl)
        return jax.vmap(one)(p_batch, inlier_masks)

    uv_ref = reproject_batch(poses)        # (S, N, 2)
    uv_fwd = reproject_batch(p_fwd_end)
    uv_back = reproject_batch(p_back_end)

    v_ref = _strict_inside(uv_ref, swo, sho)
    v_fwd = _strict_inside(uv_fwd, swo, sho)
    v_back = _strict_inside(uv_back, swo, sho)

    # patches: back from the OLDEST image, ref from frame fb0, fwd from
    # the NEWEST image (reference: :293, :300, :308), mean-normalized
    # (dopatchnorm forced, :281).  On TPU the whole score fuses into ONE
    # Pallas launch (gathers + norms + correlations, ops/ncc_pallas.py);
    # the XLA path below is its CPU/bit-oracle twin.
    from invcompcamtrack_tpu.match.ncc import patch_correlation_combine
    from invcompcamtrack_tpu.ops.ncc_pallas import ncc3_available, ncc3_scores

    img_lvl = pyramids[0][lvl].img
    if ncc3_available(img_lvl.shape, img_lvl.dtype, cfg.psz):
        clean = lambda uv: jnp.where(jnp.isfinite(uv), uv, 0.0)
        corr_br, corr_rf = ncc3_scores(
            pyramids[0][lvl].img, pyramids[fb0][lvl].img,
            pyramids[-1][lvl].img,
            clean(uv_back), clean(uv_ref), clean(uv_fwd),
            psz=cfg.psz, padding=cfg.psz,
        )
        corr = patch_correlation_combine(
            corr_br, corr_rf, v_back, v_ref, v_fwd, (fb0, fb1))
    else:
        def patches(pyr, uv):
            uv = jnp.where(jnp.isfinite(uv), uv, 0.0)
            return extract_patches(pyr[lvl].img, uv, cfg.psz, cfg.psz,
                                   patch_norm=True)

        pat_back = patches(pyramids[0], uv_back)
        pat_ref = patches(pyramids[fb0], uv_ref)
        pat_fwd = patches(pyramids[-1], uv_fwd)

        corr = patch_correlation_score(
            pat_back, pat_ref, pat_fwd, v_back, v_ref, v_fwd, (fb0, fb1)
        )
    corr = jnp.where(inlier_masks, corr, -1.0)

    m = inlier_masks.astype(corr.dtype)
    mean_corr = jnp.sum(jnp.where(inlier_masks, corr, 0.0) * 1.0, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0
    )
    return ChainResult(pose_tracks=pose_tracks, correlations=corr, mean_corr=mean_corr)


def select_best(result: ChainResult, valid: jnp.ndarray):
    """Winner = highest mean patch correlation among valid hypotheses
    (reference: func_ransac_fitcameras_odom.m:151-154).  Returns
    (best_index, best_mean_corr)."""
    score = jnp.where(valid, result.mean_corr, -jnp.inf)
    best = jnp.argmax(score)
    return best, score[best]
