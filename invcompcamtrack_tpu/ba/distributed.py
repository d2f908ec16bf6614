"""Landmark-sharded distributed bundle adjustment.

The multi-chip scale-out of ``ba/window.py`` (SURVEY.md §2.4, §5): the
landmark axis is partitioned over a mesh axis (default ``"model"``);
every pose-indexed contraction over landmarks (H_pp, b_p, the Schur
products) becomes a local partial reduced with one ``psum`` of small
pose-indexed tensors (6K + (6K)^2 floats) over ICI.  The reduced camera
system is solved redundantly on every device (it is tiny) and landmarks
back-substitute locally — zero communication beyond the psums per
iteration.

Since round 3 this is a thin ``shard_map`` wrapper around the SAME
``ba_solve`` the single-device engine uses (``psum_axis`` threads the
collectives through), so the distributed path carries every solver
feature — Huber IRLS, landmark trust region, per-landmark accept,
spectral observability floor, odometry-prior factors — with parity by
construction.

This is the framework's long-context mechanism: window growth adds
landmarks, and landmarks shard; the camera system stays O(window).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from invcompcamtrack_tpu.ba.window import BAProblem, OdoFactors, ba_solve


def ba_solve_sharded(prob: BAProblem, mesh: Mesh, num_iters: int = 10,
                     damp_init: float = 1e-3, damp_up: float = 10.0,
                     damp_down: float = 10.0, axis: str = "model",
                     huber_delta: float | None = None,
                     reduced_solver: str = "dense", cg_iters: int = 32,
                     lm_step_clip: float | None = None,
                     per_landmark_accept: bool = False,
                     damp_min: float = 0.0,
                     lm_eig_floor: float | None = None,
                     odo: OdoFactors | None = None,
                     motion_only: bool = False):
    """Distributed LM loop.  The landmark dimension L of ``prob`` must be
    divisible by the mesh axis size; observations/mask shard with it.
    Accepts every ``ba_solve`` option (same defaults).

    Returns (poses, landmarks, (err, err0)) exactly like ``ba_solve``.
    """
    lm_spec = P(axis)
    obs_spec = P(None, axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), lm_spec, obs_spec, P(None, axis), P()),
        out_specs=(P(), lm_spec, P()),
    )
    def run(poses, landmarks, obs, mask, fixed):
        local = prob._replace(
            poses=poses, landmarks=landmarks, obs=obs, mask=mask,
            fixed_pose_mask=fixed,
        )
        ps, lms, (err, err0) = ba_solve(
            local, num_iters=num_iters, damp_init=damp_init,
            damp_up=damp_up, damp_down=damp_down, huber_delta=huber_delta,
            reduced_solver=reduced_solver, cg_iters=cg_iters,
            lm_step_clip=lm_step_clip,
            per_landmark_accept=per_landmark_accept,
            damp_min=damp_min, lm_eig_floor=lm_eig_floor, odo=odo,
            psum_axis=axis, motion_only=motion_only,
        )
        return ps, lms, jnp.stack([err, err0])

    poses, lms, errs = run(
        prob.poses, prob.landmarks, prob.obs, prob.mask, prob.fixed_pose_mask
    )
    return poses, lms, (errs[0], errs[1])
