"""The monocular visual-odometry engine.

Frame loop (SURVEY.md §7 layer 6): pyramid -> IC-GN pose tracking
against the last keyframe's map points -> keyframe policy -> LK track +
triangulate new landmarks -> sliding-window bundle adjustment.

The reference repo stops at per-pair tracking driven by MATLAB scripts
(reference: run_odometer_test.m:197-244 runs the C++ tracker frame to
frame and compares against GT; BA is an explicit TODO,
run_test_OF_track.py:449-451) — this engine is the integrated,
self-contained completion of that pipeline.

Design: a host-side orchestrator over jitted fixed-shape steps.
The map is a fixed-capacity landmark table (capacity ``max_landmarks``)
with validity masks; the BA window holds ``window`` keyframes.  All
device steps compile once (shapes never change frame to frame).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.ba.window import BAProblem, ba_solve
from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core import pose as pose_ops
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match.features import shi_tomasi_corners
from invcompcamtrack_tpu.match.lk import lk_forward_backward
from invcompcamtrack_tpu.sfm.triangulate import triangulate_dlt, triangulate_gn
from invcompcamtrack_tpu.solver.icgn import track_pose


@dataclasses.dataclass
class VOConfig:
    tracker: ICGNParams = dataclasses.field(default_factory=ICGNParams)
    max_landmarks: int = 512
    window: int = 5              # BA keyframe window
    keyframe_stride: int = 2     # promote every k-th frame to keyframe
    ba_iters: int = 6
    min_parallax_px: float = 2.0  # parallax needed to triangulate
    lk_psz: int = 8
    corners_per_kf: int = 512


class VisualOdometry:
    """Stateful host orchestrator; all compute in jitted device steps."""

    def __init__(self, cam: CameraPyramid, fc, cc, cfg: VOConfig | None = None,
                 dtype=jnp.float32):
        self.cam = cam
        self.cfg = cfg or VOConfig()
        self.fc = fc
        self.cc = cc
        self.dtype = dtype

        L = self.cfg.max_landmarks
        K = self.cfg.window
        self.landmarks = jnp.zeros((L, 3), dtype)
        self.lm_valid = jnp.zeros((L,), bool)
        self.kf_poses = jnp.zeros((K, 6), dtype)
        self.kf_valid = np.zeros((K,), bool)
        self.kf_obs = jnp.zeros((K, L, 2), dtype)
        self.kf_obs_mask = jnp.zeros((K, L), bool)
        self.kf_pyramids = [None] * K

        self.cur_pose = jnp.zeros((6,), dtype)
        self.frame_idx = 0
        self.trajectory: list[np.ndarray] = []
        self._last_kf_slot: Optional[int] = None

        cfgt = self.cfg.tracker
        self._track = jax.jit(
            lambda pa, pb, X, p, m: track_pose(pa, pb, X, p, cam, cfgt,
                                               point_mask=m)
        )
        self._pyr = jax.jit(
            lambda img: build_pyramid(img, cfgt.num_levels, cfgt.psz)
        )
        self._corners = jax.jit(
            lambda img: shi_tomasi_corners(img, max_corners=self.cfg.corners_per_kf,
                                           border=cfgt.psz)
        )
        self._lk = jax.jit(
            lambda pa, pb, xy: lk_forward_backward(
                pa, pb, xy, psz=self.cfg.lk_psz, num_levels=cfgt.num_levels
            )
        )
        self._ba = jax.jit(
            lambda prob: ba_solve(prob, num_iters=self.cfg.ba_iters)
        )

    # ---------- internals ----------

    def _observe(self, pose, pyr):
        """Project valid landmarks; return (uv, visible-mask)."""
        fx, fy, cx, cy, swo, sho = self.cam.level(0)
        G = lie.se3_exp(pose)
        uv = pose_ops.project_points(G, self.landmarks, fx, fy, cx, cy)
        vis = pose_ops.in_frustum(uv, swo, sho) & self.lm_valid
        return uv, vis

    def _promote_keyframe(self, pyr, pose):
        K = self.cfg.window
        slot = self.frame_idx // self.cfg.keyframe_stride % K

        # ---- triangulate new landmarks from the previous keyframe ----
        if self._last_kf_slot is not None:
            prev = self._last_kf_slot
            pyr_prev = self.kf_pyramids[prev]
            pose_prev = self.kf_poses[prev]
            xy0, cvalid = self._corners(pyr_prev[0].img[
                self.cfg.tracker.psz:-self.cfg.tracker.psz,
                self.cfg.tracker.psz:-self.cfg.tracker.psz,
            ])
            xy1, ok = self._lk(pyr_prev, pyr, xy0)
            parallax = jnp.linalg.norm(xy1 - xy0, axis=1)
            good = cvalid & ok & (parallax > self.cfg.min_parallax_px)

            G0 = lie.se3_exp(pose_prev)
            G1 = lie.se3_exp(pose)
            P0 = pose_ops.projection_matrix(
                self.fc, self.cc, G0[:, :3], lie.camera_center(G0))
            P1 = pose_ops.projection_matrix(
                self.fc, self.cc, G1[:, :3], lie.camera_center(G1))
            P = jnp.broadcast_to(jnp.stack([P0, P1]), (xy0.shape[0], 2, 3, 4))
            obs = jnp.stack([xy0, xy1], axis=1)
            X_new, _ = triangulate_dlt(
                P, obs, R0=G0[:, :3], c0=lie.camera_center(G0))
            X_new, _ = triangulate_gn(P, obs, jnp.nan_to_num(X_new), num_iters=3)
            depth_ok = (
                (pose_ops.transform_points(G1, X_new)[..., 2] > 0.05)
                & jnp.all(jnp.isfinite(X_new), axis=1)
            )
            good = good & depth_ok

            # fill free landmark slots
            self.landmarks, self.lm_valid = _fill_slots(
                self.landmarks, self.lm_valid, X_new, good)

        # ---- record keyframe ----
        uv, vis = self._observe(pose, pyr)
        self.kf_poses = self.kf_poses.at[slot].set(pose)
        self.kf_obs = self.kf_obs.at[slot].set(uv)
        self.kf_obs_mask = self.kf_obs_mask.at[slot].set(vis)
        self.kf_pyramids[slot] = pyr
        self.kf_valid[slot] = True
        self._last_kf_slot = slot

        # ---- windowed BA ----
        if int(np.sum(self.kf_valid)) >= 3 and int(self.lm_valid.sum()) >= 12:
            fixed = jnp.asarray(~self._two_oldest_free_mask())
            fx, fy, cx, cy, _, _ = self.cam.level(0)
            prob = BAProblem(
                poses=self.kf_poses,
                landmarks=self.landmarks,
                obs=self.kf_obs,
                mask=self.kf_obs_mask & jnp.asarray(self.kf_valid)[:, None]
                & self.lm_valid[None, :],
                fx=fx, fy=fy, cx=cx, cy=cy,
                fixed_pose_mask=fixed,
            )
            poses, lms, (err, err0) = self._ba(prob)
            self.kf_poses = poses
            self.landmarks = lms
            if slot == self._last_kf_slot:
                self.cur_pose = poses[slot]

    def _two_oldest_free_mask(self):
        """True for the (up to) two most recently *movable* keyframes;
        the rest stay fixed as the gauge anchor."""
        K = self.cfg.window
        free = np.zeros(K, bool)
        if self._last_kf_slot is not None and np.sum(self.kf_valid) >= 3:
            free[self._last_kf_slot] = True
            prev = (self._last_kf_slot - 1) % K
            if self.kf_valid[prev]:
                free[prev] = True
        return free

    # ---------- public API ----------

    def bootstrap_from_images(self, img0, img1, key=None, scale: float = 1.0,
                              num_matches: int = 512):
        """GT-free initialization: corners + fb-LK matches -> essential
        matrix -> relative pose + triangulated seeds (sfm/twoview.py).
        Monocular scale is fixed to ``scale`` * unit baseline.
        Returns the number of seed landmarks."""
        import jax as _jax

        from invcompcamtrack_tpu.sfm.twoview import initialize_two_view

        if key is None:
            key = _jax.random.PRNGKey(0)
        cfgt = self.cfg.tracker
        pyr0 = self._pyr(jnp.asarray(img0, self.dtype))
        pyr1 = self._pyr(jnp.asarray(img1, self.dtype))
        xy0, cvalid = shi_tomasi_corners(
            pyr0[0].img[cfgt.psz:-cfgt.psz, cfgt.psz:-cfgt.psz],
            max_corners=num_matches, border=cfgt.psz,
        )
        xy1, ok = self._lk(pyr0, pyr1, xy0)
        fc = jnp.asarray(self.fc, self.dtype)
        cc = jnp.asarray(self.cc, self.dtype)
        res = initialize_two_view(
            key, (xy0 - cc) / fc, (xy1 - cc) / fc, cvalid & ok
        )
        G1 = lie.se3_exp(res.pose1)
        c1 = lie.camera_center(G1) * scale
        t1 = -jnp.einsum("ij,j->i", G1[:, :3], c1)
        pose1 = lie.se3_log(jnp.concatenate([G1[:, :3], t1[:, None]], axis=1))
        lms = np.asarray(res.landmarks) * scale
        valid = np.asarray(res.valid)
        self.bootstrap(img0, img1, np.zeros(6), np.asarray(pose1),
                       lms[valid])
        return int(valid.sum())

    def bootstrap(self, img0, img1, pose0, pose1, points3d, valid=None):
        """Initialize with two known poses + landmark seeds (from GT,
        stereo, or two-view SfM done by the caller)."""
        L = self.cfg.max_landmarks
        pts = np.zeros((L, 3), np.float32)
        msk = np.zeros((L,), bool)
        n = min(len(points3d), L)
        pts[:n] = np.asarray(points3d)[:n]
        msk[:n] = True if valid is None else np.asarray(valid)[:n]
        self.landmarks = jnp.asarray(pts, self.dtype)
        self.lm_valid = jnp.asarray(msk)

        pyr0 = self._pyr(jnp.asarray(img0, self.dtype))
        pyr1 = self._pyr(jnp.asarray(img1, self.dtype))
        self.cur_pose = jnp.asarray(pose0, self.dtype)
        self.frame_idx = 0
        self._promote_keyframe(pyr0, jnp.asarray(pose0, self.dtype))
        self.trajectory.append(np.asarray(lie.camera_center(lie.se3_exp(self.cur_pose))))
        self.frame_idx = 1
        self.cur_pose = jnp.asarray(pose1, self.dtype)
        self._last_pyr = pyr1
        if self.frame_idx % self.cfg.keyframe_stride == 0:
            self._promote_keyframe(pyr1, self.cur_pose)
        self.trajectory.append(np.asarray(lie.camera_center(lie.se3_exp(self.cur_pose))))
        self.frame_idx = 2

    def process_frame(self, img) -> np.ndarray:
        """Track one new frame; returns the (6,) pose estimate."""
        pyr = self._pyr(jnp.asarray(img, self.dtype))
        ref_slot = self._last_kf_slot
        pyr_ref = self.kf_pyramids[ref_slot]
        pose_ref = self.kf_poses[ref_slot]

        # points visible in the reference keyframe drive the alignment.
        # IC-GN semantics: the init pose must be the pose of the
        # *reference image* — its patches are sampled at init-pose
        # projections (reference: odometer.cpp:241-255; the chains in
        # run_track_nposes.cpp:229-246 thread poses the same way).
        _, vis = self._observe(pose_ref, pyr_ref)
        p_new = self._track(pyr_ref, pyr, self.landmarks, pose_ref, vis)
        self.cur_pose = p_new

        if self.frame_idx % self.cfg.keyframe_stride == 0:
            self._promote_keyframe(pyr, p_new)
            self.cur_pose = self.kf_poses[self._last_kf_slot]

        self._last_pyr = pyr
        self.frame_idx += 1
        c = np.asarray(lie.camera_center(lie.se3_exp(self.cur_pose)))
        self.trajectory.append(c)
        return np.asarray(self.cur_pose)


def _fill_slots(landmarks, lm_valid, candidates, cand_valid):
    """Scatter valid candidates into free landmark slots (prefix-sum slot
    assignment, same pattern as the track table)."""
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
    seeds = free & (take >= 0)
    seed_X = jnp.take(candidates, jnp.clip(take, 0, K - 1), axis=0)
    landmarks = jnp.where(seeds[:, None], seed_X.astype(landmarks.dtype), landmarks)
    return landmarks, lm_valid | seeds
