"""Landmark-sharded distributed bundle adjustment.

The multi-chip scale-out of ``ba/window.py`` (SURVEY.md §2.4, §5): the
landmark axis is partitioned over the mesh axis ``"model"``; every
landmark-indexed contraction (H_pp, b_p, the Schur products) becomes a
local partial reduced with one ``psum`` of small pose-indexed tensors
(6K + (6K)^2 floats) over ICI.  The reduced camera system is solved
redundantly on every device (it is tiny) and landmarks back-substitute
locally — zero communication beyond the two psums per iteration.

This is the framework's long-context mechanism: window growth adds
landmarks, and landmarks shard; the camera system stays O(window).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from invcompcamtrack_tpu.ba.window import (
    BAProblem,
    _jacobians,
    ba_residuals,
    huber_weights,
    schur_cg_solve,
)
from invcompcamtrack_tpu.sfm.triangulate import sym3x3_inverse

_PREC = jax.lax.Precision.HIGHEST


def _local_step(prob: BAProblem, damp, axis: str,
                huber_delta: float | None = None,
                reduced_solver: str = "dense", cg_iters: int = 32):
    """One damped (optionally Huber-IRLS) GN step on a landmark shard;
    psums over `axis`."""
    K = prob.poses.shape[0]
    res, _ = ba_residuals(prob)  # local residuals (masked)
    Jp, Jx = _jacobians(prob)
    if huber_delta is not None:
        sw = jnp.sqrt(huber_weights(res, prob.mask, huber_delta))
        res = res * sw[..., None]
        Jp = Jp * sw[..., None, None]
        Jx = Jx * sw[..., None, None]
    Jp = Jp * (~prob.fixed_pose_mask)[:, None, None, None]

    Hpp = jax.lax.psum(
        jnp.einsum("klri,klrj->kij", Jp, Jp, precision=_PREC), axis
    )
    bp = jax.lax.psum(jnp.einsum("klri,klr->ki", Jp, res, precision=_PREC), axis)
    Hxx = jnp.einsum("klri,klrj->lij", Jx, Jx, precision=_PREC)
    Hpx = jnp.einsum("klri,klrj->klij", Jp, Jx, precision=_PREC)
    bx = jnp.einsum("klri,klr->li", Jx, res, precision=_PREC)

    eye6 = jnp.eye(6, dtype=res.dtype)
    eye3 = jnp.eye(3, dtype=res.dtype)
    Hpp = Hpp + damp * eye6 * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-8
    )[..., None, :]
    Hxx = Hxx + damp * eye3 * jnp.maximum(
        jnp.diagonal(Hxx, axis1=-2, axis2=-1), 1e-8
    )[..., None, :]
    Hxx_inv = sym3x3_inverse(Hxx)

    W = jnp.einsum("klij,ljm->klim", Hpx, Hxx_inv, precision=_PREC)
    rhs = bp - jax.lax.psum(
        jnp.einsum("klim,lm->ki", W, bx, precision=_PREC), axis
    )

    if reduced_solver == "cg":
        # matrix-free PCG: one (K, 6) psum per matvec instead of the
        # (6K)^2 S_off psum — the long-window scale-out path
        dpose = schur_cg_solve(Hpp, W, Hpx, prob.fixed_pose_mask, rhs,
                               num_iters=cg_iters, psum_axis=axis)
    else:
        S_off = jax.lax.psum(
            jnp.einsum("klim,qljm->kiqj", W, Hpx, precision=_PREC), axis
        )
        S = -S_off
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp)
        fixed = prob.fixed_pose_mask.astype(res.dtype)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
            eye6 * fixed[:, None, None]
        )
        dpose = jnp.linalg.solve(
            S.reshape(6 * K, 6 * K), rhs.reshape(-1)
        ).reshape(K, 6)
    dpose = dpose * (~prob.fixed_pose_mask)[:, None]

    t = bx - jnp.einsum("klij,ki->lj", Hpx, dpose, precision=_PREC)
    dlm = jnp.einsum("lij,lj->li", Hxx_inv, t, precision=_PREC)
    return dpose, dlm


def _masked_msq(prob: BAProblem, axis: str,
                huber_delta: float | None = None):
    res, _ = ba_residuals(prob)
    if huber_delta is None:
        cost = jnp.sum(res * res)
    else:
        rn = jnp.sqrt(jnp.sum(res * res, axis=-1) + 1e-24)
        rho = jnp.where(rn <= huber_delta, rn * rn,
                        huber_delta * (2.0 * rn - huber_delta))
        cost = jnp.sum(rho * prob.mask)
    s = jax.lax.psum(cost, axis)
    cnt = jax.lax.psum(jnp.sum(prob.mask), axis)
    return s / (2.0 * jnp.maximum(cnt, 1))


def ba_solve_sharded(prob: BAProblem, mesh: Mesh, num_iters: int = 10,
                     damp_init: float = 1e-3, damp_up: float = 10.0,
                     damp_down: float = 10.0, axis: str = "model",
                     huber_delta: float | None = None,
                     reduced_solver: str = "dense", cg_iters: int = 32):
    """Distributed LM loop.  The landmark dimension L of ``prob`` must be
    divisible by the mesh axis size; observations/mask shard with it.

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
        err0 = _masked_msq(local, axis, huber_delta)

        def step(carry, _):
            ps, lms, damp, err = carry
            cur = local._replace(poses=ps, landmarks=lms)
            dpose, dlm = _local_step(cur, damp, axis, huber_delta,
                                     reduced_solver, cg_iters)
            cand = local._replace(poses=ps + dpose, landmarks=lms + dlm)
            err_new = _masked_msq(cand, axis, huber_delta)
            ok = err_new < err
            ps = jnp.where(ok, cand.poses, ps)
            lms = jnp.where(ok, cand.landmarks, lms)
            damp = jnp.where(ok, damp / damp_down, damp * damp_up)
            err = jnp.where(ok, err_new, err)
            return (ps, lms, damp, err), None

        (ps, lms, _, err), _ = jax.lax.scan(
            step,
            (poses, landmarks, jnp.asarray(damp_init, poses.dtype), err0),
            None,
            length=num_iters,
        )
        return ps, lms, jnp.stack([err, err0])

    poses, lms, errs = run(
        prob.poses, prob.landmarks, prob.obs, prob.mask, prob.fixed_pose_mask
    )
    return poses, lms, (errs[0], errs[1])
