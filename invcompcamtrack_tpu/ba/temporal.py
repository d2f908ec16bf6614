"""Temporal (sequence-parallel) bundle adjustment: the keyframe axis
sharded over devices.

``ba/distributed.py`` shards the LANDMARK axis — right when one window
has many points.  This module shards the TEMPORAL axis: a long
trajectory of K keyframes is partitioned into contiguous segments over
the ``seq`` mesh axis, the SP/CP strategy of SURVEY §2.4 (the
reference's only long-sequence mechanism is host-side windowing,
reference: misc_src/classoftrack.py:38-49 / run_track_nposes.cpp:229-265;
everything distributed here is new TPU-first design).

How the coupling travels:

- Reprojection factors couple poses only THROUGH landmarks.  With poses
  and observations sharded (K axis) and the landmark state replicated,
  every cross-segment interaction reduces to psums of landmark-indexed
  partials: ``H_xx`` (L,3,3) and ``b_x`` (L,3) once per GN step, and one
  (L,3) psum per CG matvec on the reduced camera system.  No pose block
  ever crosses a device boundary for these factors.
- Odometry-chain factors (relative-pose priors between consecutive
  keyframes, coefficient-space residual matching the framework's
  additive pose-update convention, reference semantics:
  pose.cpp:116-129) couple NEIGHBOUR poses directly.  The factor at the
  segment boundary needs the neighbour device's edge pose: a
  ``lax.ppermute`` ring halo exchange of one (6,) vector per direction
  per matvec — the "halo-exchange poses at window boundaries" design of
  SURVEY §2.4/§5 long-context.

Per GN step the wire traffic is O(L) psums + O(1) halos, independent of
K: time scales out linearly with devices while the replicated-landmark
work is the only redundancy.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from invcompcamtrack_tpu.ba.window import huber_weights
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.sfm.triangulate import sym3x3_inverse

_PREC = jax.lax.Precision.HIGHEST


class TemporalBAProblem(NamedTuple):
    poses: jnp.ndarray        # (K, 6) se(3) coeffs, x_cam = R X + t
    landmarks: jnp.ndarray    # (L, 3)
    obs: jnp.ndarray          # (K, L, 2) pixel observations
    mask: jnp.ndarray         # (K, L) bool
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    fixed_pose_mask: jnp.ndarray  # (K,) bool — True = pose held fixed
    odom: jnp.ndarray         # (K, 6) chain measurement: odom[k] ~
    #                           poses[k+1] - poses[k]; row K-1 unused
    odom_weight: jnp.ndarray  # (), (K,), or (K, 6) — 0 disables the
    #                           chain factor (row k weights the k -> k+1
    #                           factor; a (K, 6) weight gives translation
    #                           and rotation coefficients distinct sigmas)


def _project(poses, landmarks, fx, fy, cx, cy):
    """(Kd, L, 2) pinhole projections of every landmark in every pose."""
    def one(p):
        G = lie.se3_exp(p)
        Xc = jnp.einsum("ij,lj->li", G[:, :3], landmarks,
                        precision=_PREC) + G[:, 3]
        return jnp.stack([Xc[:, 0] / Xc[:, 2] * fx + cx,
                          Xc[:, 1] / Xc[:, 2] * fy + cy], axis=-1)
    return jax.vmap(one)(poses)


def _neighbor_edges(x_local, axis):
    """Halo exchange of segment-edge pose vectors.

    x_local: (Kd, 6) this device's rows.  Returns
    (right_first, left_last): the RIGHT neighbour's first row and the
    LEFT neighbour's last row, each (6,), zeros at the chain ends.
    """
    n = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to the right
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to the left
    idx = jax.lax.axis_index(axis)
    # my first row travels left (so each device receives its RIGHT
    # neighbour's first row); my last row travels right
    right_first = jax.lax.ppermute(x_local[0], axis, bwd)
    left_last = jax.lax.ppermute(x_local[-1], axis, fwd)
    right_first = jnp.where(idx == n - 1, 0.0, right_first)
    left_last = jnp.where(idx == 0, 0.0, left_last)
    return right_first, left_last


def _prev_factor_weight(w_local, axis):
    """w_{k-1} per local row ((Kd, 6) per-coefficient weights): local
    shift, boundary row from the left neighbour's last factor weight via
    the ring halo."""
    _, w_left = _neighbor_edges(w_local, axis)
    return jnp.concatenate([w_left[None], w_local[:-1]], axis=0)


def _chain_matvec(x, free_f, w_local, axis):
    """y += H_chain x for the odometry chain, with ring halos.

    x: (Kd, 6) local slice of the pose update.  Factor k (local row k,
    per-coefficient weight w_local[k]) couples rows k and k+1; the last
    local factor couples into the right neighbour's first row, and the
    left neighbour's last factor couples into local row 0.  A FIXED
    neighbour contributes dx = 0 to the coupling but its incident
    factor still stiffens the free side's diagonal (the chain anchors
    free poses to fixed ones).
    """
    xm = x * free_f[:, None]
    right_first, left_last = _neighbor_edges(xm, axis)
    w_prev = _prev_factor_weight(w_local, axis)
    x_next = jnp.concatenate([xm[1:], right_first[None]], axis=0)
    x_prev = jnp.concatenate([left_last[None], xm[:-1]], axis=0)
    # factor k: + w_k (x_k - x_{k+1}) on row k; factor k-1:
    # + w_{k-1} (x_k - x_{k-1}) on row k
    y = w_local * (xm - x_next) + w_prev * (xm - x_prev)
    return y * free_f[:, None]


def _chain_residual(poses_local, odom_local, axis):
    """e[k] = poses[k+1] - poses[k] - odom[k] per local factor (Kd, 6);
    the last device's last row is padded with zeros (no factor K-1)."""
    right_first, _ = _neighbor_edges(poses_local, axis)
    nxt = jnp.concatenate([poses_local[1:], right_first[None]], axis=0)
    return nxt - poses_local - odom_local


def _chain_weight_mask(w, free_f, axis):
    """Per-local-row, per-coefficient factor weight (Kd, 6): accepts
    scalar, (Kd,), or (Kd, 6) input (a (Kd, 6) weight expresses distinct
    translation/rotation sigmas, the engine's odo_sigma_t/odo_sigma_r);
    zeroed for the final chain row (factor K-1 does not exist)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    Kd = free_f.shape[0]
    last = (idx == n - 1)
    w = jnp.asarray(w, free_f.dtype)
    if w.ndim == 1:
        w = w[:, None]
    row_w = jnp.broadcast_to(w, (Kd, 6))
    is_last_row = (jnp.arange(Kd) == Kd - 1)[:, None]
    return jnp.where(last & is_last_row, 0.0, row_w)


def _temporal_spmd(poses, landmarks, obs, mask, fixed, odom, odom_w,
                   intr, *, axis, num_iters, damp_init, damp_up,
                   damp_down, huber_delta, cg_iters, motion_only):
    """The shard_map body: everything pose-indexed is a (Kd, ...) local
    slice; landmarks are replicated."""
    fx, fy, cx, cy = intr
    dtype = poses.dtype
    free_f = (~fixed).astype(dtype)
    L = landmarks.shape[0]

    def cost(poses_l, lms):
        proj = _project(poses_l, lms, fx, fy, cx, cy)
        # where(), not *: masked non-finite projections (empty slots,
        # behind-camera points) must contribute exactly 0, not NaN;
        # observed non-finite projections read as very costly
        raw = jnp.where(mask[..., None], obs - proj, 0.0)
        res = jnp.where(jnp.isfinite(raw), raw,
                        jnp.where(mask[..., None], 1e6, 0.0))
        if huber_delta is None:
            c_loc = jnp.sum(res * res)
        else:
            rn = jnp.sqrt(jnp.sum(res * res, axis=-1) + 1e-24)
            rho = jnp.where(rn <= huber_delta, rn * rn,
                            huber_delta * (2.0 * rn - huber_delta))
            c_loc = jnp.sum(jnp.where(mask, rho, 0.0))
        w_row = _chain_weight_mask(odom_w, free_f, axis)
        e = _chain_residual(poses_l, odom, axis)
        c_loc = c_loc + jnp.sum(w_row * e * e)
        cnt = jax.lax.psum(jnp.maximum(jnp.sum(mask), 0), axis)
        return jax.lax.psum(c_loc, axis) / (2.0 * jnp.maximum(cnt, 1))

    def gn_step(poses_l, lms, damp):
        # --- per-observation Jacobians (local K-slice x all L) ---
        def f(p, X):
            G = lie.se3_exp(p)
            Xc = G[:, :3] @ X + G[:, 3]
            return jnp.stack([Xc[0] / Xc[2] * fx + cx,
                              Xc[1] / Xc[2] * fy + cy])

        proj = _project(poses_l, lms, fx, fy, cx, cy)
        raw = jnp.where(mask[..., None], obs - proj, 0.0)
        res = jnp.where(jnp.isfinite(raw), raw,
                        jnp.where(mask[..., None], 1e6, 0.0))
        Jp, Jx = jax.vmap(
            lambda p: jax.vmap(
                lambda X: jax.jacfwd(f, argnums=(0, 1))(p, X))(lms)
        )(poses_l)
        m = mask[..., None, None]
        Jp = jnp.where(m & jnp.isfinite(Jp), Jp, 0.0)
        Jx = jnp.where(m & jnp.isfinite(Jx), Jx, 0.0)
        if motion_only is True:
            # landmarks frozen (the engine's hybrid pose-polish phase):
            # zero landmark Jacobians kill Hpx/Hxx/bx, so W = 0 and the
            # back-substituted dlm is exactly 0 — no spectral machinery
            Jx = jnp.zeros_like(Jx)
        elif not isinstance(motion_only, bool):
            # traced gate (engine turnover routing); rides the shard_map
            # closure as an implicit replicated capture, like huber
            Jx = jnp.where(motion_only, jnp.zeros_like(Jx), Jx)
        if huber_delta is not None:
            sw = jnp.sqrt(huber_weights(res, mask, huber_delta))
            res = res * sw[..., None]
            Jp = Jp * sw[..., None, None]
            Jx = Jx * sw[..., None, None]
        Jp = Jp * free_f[:, None, None, None]

        # --- normal-equation blocks; landmark blocks psum over shards ---
        Hpp = jnp.einsum("klri,klrj->kij", Jp, Jp, precision=_PREC)
        Hxx = jax.lax.psum(
            jnp.einsum("klri,klrj->lij", Jx, Jx, precision=_PREC), axis)
        Hpx = jnp.einsum("klri,klrj->klij", Jp, Jx, precision=_PREC)
        bp = jnp.einsum("klri,klr->ki", Jp, res, precision=_PREC)
        bx = jax.lax.psum(
            jnp.einsum("klri,klr->li", Jx, res, precision=_PREC), axis)

        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        Hpp = Hpp + damp * eye6 * jnp.maximum(
            jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-8)[..., None, :] * eye6
        Hxx = Hxx + damp * eye3 * jnp.maximum(
            jnp.diagonal(Hxx, axis1=-2, axis2=-1), 1e-8)[..., None, :] * eye3
        Hxx_inv = sym3x3_inverse(Hxx)

        W = jnp.einsum("klij,ljm->klim", Hpx, Hxx_inv, precision=_PREC)
        rhs = bp - jnp.einsum("klim,lm->ki", W, bx, precision=_PREC)

        # chain rhs: J^T res with res_k = odom_k - (p_{k+1}-p_k) = -e_k;
        # d(predicted)/dp_k = -I, /dp_{k+1} = +I  =>  rhs_k += w e_k,
        # rhs_{k+1} -= w_k e_k (incoming factor via halo)
        w_row = _chain_weight_mask(odom_w, free_f, axis)
        e = _chain_residual(poses_l, odom, axis)
        we = w_row * e
        _, left_last_we = _neighbor_edges(we, axis)
        we_prev = jnp.concatenate([left_last_we[None], we[:-1]], axis=0)
        rhs = (rhs + we - we_prev) * free_f[:, None]

        # --- matrix-free PCG on the distributed reduced system ---
        def matvec(x):
            x = x * free_f[:, None]
            t = jax.lax.psum(
                jnp.einsum("klim,ki->lm", Hpx, x, precision=_PREC), axis)
            y = jnp.einsum("klim,lm->ki", W, t, precision=_PREC)
            out = jnp.einsum("kij,kj->ki", Hpp, x, precision=_PREC) - y
            out = out + _chain_matvec(x, free_f, w_row, axis)
            # identity rows keep fixed poses invertible, step stays 0
            return out * free_f[:, None] + x * (1.0 - free_f)[:, None]

        # block-diagonal preconditioner: S_kk plus the chain's diagonal
        S_kk = Hpp - jnp.einsum("klim,kljm->kij", W, Hpx, precision=_PREC)
        w_prev = _prev_factor_weight(w_row, axis)
        chain_diag = (w_row + w_prev) * free_f[:, None] \
            + fixed.astype(dtype)[:, None]
        S_kk = S_kk + jnp.eye(6, dtype=dtype) * chain_diag[:, None, :]

        def prec(r):
            return jnp.linalg.solve(S_kk, r[..., None])[..., 0]

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b), axis)

        x0 = jnp.zeros_like(rhs)
        r0 = rhs - matvec(x0)
        z0 = prec(r0)
        rz0 = pdot(r0, z0)

        def body(carry, _):
            x, r, p, rz = carry
            Ap = matvec(p)
            denom = pdot(p, Ap)
            alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
            alpha = jnp.where(rz > 1e-12, alpha, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_new = pdot(r, z)
            beta = jnp.where(rz > 1e-30, rz_new / rz, 0.0)
            return (x, r, z + beta * p, rz_new), None

        (dpose, _, _, _), _ = jax.lax.scan(body, (x0, r0, z0, rz0), None,
                                           length=cg_iters)
        dpose = dpose * free_f[:, None]

        # --- landmark back-substitution (psum'd, replicated result) ---
        t = bx - jax.lax.psum(
            jnp.einsum("klij,ki->lj", Hpx, dpose, precision=_PREC), axis)
        dlm = jnp.einsum("lij,lj->li", Hxx_inv, t, precision=_PREC)
        return dpose, dlm

    def lm_iter(carry, _):
        poses_l, lms, damp, err = carry
        dpose, dlm = gn_step(poses_l, lms, damp)
        cand_p, cand_x = poses_l + dpose, lms + dlm
        err_new = cost(cand_p, cand_x)
        ok = err_new < err
        poses_l = jnp.where(ok, cand_p, poses_l)
        lms = jnp.where(ok, cand_x, lms)
        damp = jnp.where(ok, damp / damp_down, damp * damp_up)
        err = jnp.where(ok, err_new, err)
        return (poses_l, lms, damp, err), err

    err0 = cost(poses, landmarks)
    (poses, landmarks, _, err), _ = jax.lax.scan(
        lm_iter, (poses, landmarks, jnp.asarray(damp_init, dtype), err0),
        None, length=num_iters)
    return poses, landmarks, err, err0


def temporal_ba_solve(prob: TemporalBAProblem, mesh: Mesh,
                      axis: str = "seq", num_iters: int = 10,
                      damp_init: float = 1e-3, damp_up: float = 10.0,
                      damp_down: float = 10.0,
                      huber_delta: float | None = None,
                      cg_iters: int = 32,
                      motion_only: bool = False):
    """Levenberg-Marquardt BA with the keyframe axis sharded over
    ``mesh[axis]``.  K must divide evenly by the axis size.  Returns
    (poses, landmarks, (err, err0)); landmarks replicated.
    """
    K = prob.poses.shape[0]
    n = mesh.shape[axis]
    if K % n != 0:
        raise ValueError(f"K={K} not divisible by {axis} axis size {n}")

    body = partial(
        _temporal_spmd, axis=axis, num_iters=num_iters,
        damp_init=damp_init, damp_up=damp_up, damp_down=damp_down,
        huber_delta=huber_delta, cg_iters=cg_iters,
        motion_only=motion_only,
    )
    seq = P(axis)
    odom_w = jnp.asarray(prob.odom_weight, prob.poses.dtype)
    # a scalar weight is replicated; per-factor (K,)/(K, 6) weights ride
    # the keyframe axis like the factors they weight
    w_spec = P() if odom_w.ndim == 0 else seq
    fn = jax.shard_map(
        lambda *a: body(*a),
        mesh=mesh,
        in_specs=(seq, P(), seq, seq, seq, seq, w_spec, P()),
        out_specs=(seq, P(), P(), P()),
        check_vma=False,
    )
    poses, lms, err, err0 = fn(
        prob.poses, prob.landmarks, prob.obs, prob.mask,
        prob.fixed_pose_mask, prob.odom, odom_w,
        (prob.fx, prob.fy, prob.cx, prob.cy),
    )
    return poses, lms, (err, err0)
