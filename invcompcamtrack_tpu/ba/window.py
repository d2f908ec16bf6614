"""Sliding-window bundle adjustment via Schur-complement reduction.

The reference never shipped BA — it is an explicit TODO
("BA Adjust cameras and static points", reference:
misc_src/run_test_OF_track.py:449-451); its closest machinery is
per-point LM refinement (triang.c) and multi-step smoothing
(run_3DPoint_triangulation_error_test.ipynb cell 1).  This module is the
designed-from-scratch completion of that TODO, shaped for TPU:

- the observation set is a dense ``(K poses, L landmarks)`` grid with a
  boolean mask (fixed shapes; missing observations contribute zeros),
- per-observation Jacobians come from forward-mode AD of the same
  projection + se(3) code the tracker uses (exact, no hand-derived
  block formulas to maintain),
- the landmark blocks ``H_ll`` are L independent 3x3 systems inverted in
  closed form; the reduced camera system
  ``S = H_pp - H_pl H_ll^{-1} H_lp`` is a dense (6K, 6K) solve — K is a
  *window*, so 6K stays small (<= ~100) and the whole step is einsums
  feeding the MXU,
- Levenberg damping with accept/reject, gauge freedom removed by a
  ``fixed_pose_mask``.

The landmark axis L is the natural shard axis for multi-device runs
(see ba/distributed.py): every landmark-indexed contraction becomes a
local partial + one psum of (6K + 6K x 6K) sized reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.ops.linalg import sym3x3_trunc_pinv
from invcompcamtrack_tpu.sfm.triangulate import sym3x3_inverse

_PREC = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    poses: jnp.ndarray        # (K, 6) se(3) coeffs, x_cam = R X + t
    landmarks: jnp.ndarray    # (L, 3)
    obs: jnp.ndarray          # (K, L, 2) pixel observations
    mask: jnp.ndarray         # (K, L) bool
    fx: jnp.ndarray           # scalars (shared intrinsics)
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    fixed_pose_mask: jnp.ndarray  # (K,) bool — True = pose held fixed


class OdoFactors(NamedTuple):
    """Relative-pose (odometry) prior factors between ring-consecutive
    poses — the tightly-coupled fusion of the photometric odometer into
    the reprojection BA.

    Without these, joint BA *replaces* the tracker's pose with whatever
    the (possibly sparse, freshly-triangulated) reprojection terms
    prefer; with them, BA *fuses* both measurements, so a window with
    weak structure can never be dragged below pure-odometry quality.
    Factor k constrains poses ``(k-1) % K -> k`` (ring slot order).
    """

    rel: jnp.ndarray     # (K, 3, 4) measured relative group G_k G_{k-1}^{-1}
    mask: jnp.ndarray    # (K,) bool — factor k active
    w_t: jnp.ndarray     # scalar: pixel-equivalent weight per unit translation
    w_r: jnp.ndarray     # scalar: pixel-equivalent weight per radian
    info_sqrt: jnp.ndarray | None = None  # optional (K, 6, 6) square
    #   root of each factor's full information matrix in the residual
    #   coordinates: r = info_sqrt[k] @ [t_D, vex(R_D)], so the factor
    #   cost is ru^T (S^T S) ru.  When set it REPLACES the isotropic
    #   w_t/w_r weighting — the engine builds it from the photometric
    #   tracker's own converged GN Hessian (its measured Fisher
    #   information), so the prior is exactly as stiff as the odometer
    #   was accurate, per direction (anisotropic: a forward-motion
    #   odometer is weak along the optical axis and the window
    #   constraints own that direction; a lateral one is strong and the
    #   polish cannot degrade it).


def odo_residuals(poses: jnp.ndarray, odo: OdoFactors) -> jnp.ndarray:
    """(K, 6) weighted relative-pose discrepancy residuals.

    Discrepancy D = (G_k G_{k-1}^{-1}) rel_k^{-1}; the residual is the
    first-order se(3) coordinate of D: [t_D, vex(R_D - R_D^T)/2] — a
    polynomial in the pose entries (AD-safe everywhere, unlike the exact
    log map whose arccos derivative blows up at the identity, exactly
    where a converged prior lives).
    """
    G = jax.vmap(lie.se3_exp)(poses)
    Gp = jnp.roll(G, 1, axis=0)
    G_rel = lie.se3_compose(G, lie.se3_inverse(Gp))
    D = lie.se3_compose(G_rel, lie.se3_inverse(odo.rel))
    R = D[..., :3]
    rw = 0.5 * jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                          R[..., 0, 2] - R[..., 2, 0],
                          R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    if odo.info_sqrt is None:
        r = jnp.concatenate([D[..., 3] * odo.w_t, rw * odo.w_r], axis=-1)
    else:
        ru = jnp.concatenate([D[..., 3], rw], axis=-1)
        r = jnp.einsum("kij,kj->ki", odo.info_sqrt, ru, precision=_PREC)
    return jnp.where(odo.mask[:, None], r, 0.0)


def _odo_system(poses: jnp.ndarray, odo: OdoFactors, fixed: jnp.ndarray):
    """GN system of the odometry factors: (H (6K, 6K), b (K, 6), cost).

    b is J^T (-r) so it adds directly onto the reprojection rhs
    (which uses res = measurement - model).  Fixed poses' columns are
    zeroed; K is a small window, so the dense (6K, 6K) H is cheap and
    exact (block-tridiagonal + ring wrap in structure).
    """
    K = poses.shape[0]

    def rfun(ps):
        return odo_residuals(ps, odo).reshape(-1)

    r = rfun(poses)
    J = jax.jacfwd(rfun)(poses)                      # (6K, K, 6)
    J = jnp.where(fixed[None, :, None], 0.0, J).reshape(6 * K, 6 * K)
    H = jnp.matmul(J.T, J, precision=_PREC)
    b = -jnp.matmul(J.T, r, precision=_PREC).reshape(K, 6)
    return H, b, jnp.sum(r * r)


def _project_one(p, X, fx, fy, cx, cy):
    G = lie.se3_exp(p)
    Xc = G[:, :3] @ X + G[:, 3]
    return jnp.stack([Xc[0] / Xc[2] * fx + cx, Xc[1] / Xc[2] * fy + cy])


def _psum(x, axis: str | None):
    return jax.lax.psum(x, axis) if axis is not None else x


def ba_residuals(prob: BAProblem, huber_delta: float | None = None,
                 psum_axis: str | None = None):
    """(K, L, 2) masked residuals obs - proj and the mean cost.

    With ``huber_delta`` the cost is the Huber robust loss on the
    per-observation residual norm (quadratic inside delta, linear
    outside); the residual tensor itself is returned unweighted.
    With ``psum_axis`` (inside shard_map over the landmark axis) the
    cost numerator/denominator are psum-reduced — the residual tensor
    stays the local shard.
    """
    proj = jax.vmap(
        lambda p: jax.vmap(
            lambda X: _project_one(p, X, prob.fx, prob.fy, prob.cx, prob.cy)
        )(prob.landmarks)
    )(prob.poses)
    # masked entries must be EXACTLY zero even when proj is inf/NaN
    # (landmarks behind the camera, empty slots at the origin) — a
    # multiplicative mask would turn inf*0 into NaN and poison every
    # downstream reduction, so use where().  An OBSERVED entry whose
    # projection is non-finite gets a large sentinel residual instead:
    # a candidate state that throws a tracked landmark behind the
    # camera must read as very costly, not as free.
    raw = jnp.where(prob.mask[..., None], prob.obs - proj, 0.0)
    res = jnp.where(jnp.isfinite(raw), raw,
                    jnp.where(prob.mask[..., None], 1e6, 0.0))
    cnt = jnp.maximum(_psum(jnp.sum(prob.mask), psum_axis), 1)
    if huber_delta is None:
        return res, _psum(jnp.sum(res * res), psum_axis) / (2.0 * cnt)
    rn = jnp.sqrt(jnp.sum(res * res, axis=-1) + 1e-24)
    rho = jnp.where(rn <= huber_delta, rn * rn,
                    huber_delta * (2.0 * rn - huber_delta))
    return res, _psum(jnp.sum(jnp.where(prob.mask, rho, 0.0)),
                      psum_axis) / (2.0 * cnt)


def huber_weights(res: jnp.ndarray, mask: jnp.ndarray, delta: float):
    """(K, L) IRLS weights w = min(1, delta/|r|) of the Huber loss."""
    rn = jnp.sqrt(jnp.sum(res * res, axis=-1) + 1e-24)
    return jnp.where(rn <= delta, 1.0, delta / rn) * mask


def _per_landmark_cost(res, mask, huber_delta):
    """(L,) robust cost of each landmark's observations."""
    rn2 = jnp.sum(res * res, axis=-1)
    if huber_delta is None:
        rho = rn2
    else:
        rn = jnp.sqrt(rn2 + 1e-24)
        rho = jnp.where(rn <= huber_delta, rn2,
                        huber_delta * (2.0 * rn - huber_delta))
    return jnp.sum(jnp.where(mask, rho, 0.0), axis=0)


def _jacobians(prob: BAProblem):
    """J_p: (K, L, 2, 6); J_x: (K, L, 2, 3) — forward-mode AD, masked."""

    def f(p, X):
        return _project_one(p, X, prob.fx, prob.fy, prob.cx, prob.cy)

    jp, jx = jax.vmap(
        lambda p: jax.vmap(lambda X: jax.jacfwd(f, argnums=(0, 1))(p, X))(
            prob.landmarks
        )
    )(prob.poses)
    # where(), not *: masked entries with non-finite Jacobians (empty
    # slots / behind-camera points divide by z~0) must become exactly 0
    m = prob.mask[..., None, None]
    jp = jnp.where(m & jnp.isfinite(jp), jp, 0.0)
    jx = jnp.where(m & jnp.isfinite(jx), jx, 0.0)
    return jp, jx


def schur_cg_solve(Hpp, W, Hpx, fixed, rhs, num_iters: int = 32,
                   tol: float = 1e-10, psum_axis: str | None = None,
                   H_extra: jnp.ndarray | None = None):
    """Matrix-free preconditioned CG on the reduced camera system.

    Solves ``S x = rhs`` where ``S = Hpp_diag + fixed*I - W Hxp^T``
    WITHOUT materializing the (6K, 6K) matrix: each matvec is two
    (K, L)-sized einsums, so cost is O(K L) per iteration instead of the
    dense construction's O(K^2 L) + O(K^3) solve — the long-window path
    (K >~ 50) the dense solve cannot scale to.

    Preconditioner: exact block-diagonal of S (K dense 6x6 solves).
    With ``psum_axis`` (inside shard_map over the landmark axis) the
    landmark contractions become local partials + one psum of (K, 6)
    [matvec] or (K, 6, 6) [preconditioner] per application.
    """
    K = rhs.shape[0]
    dtype = rhs.dtype
    fixed_f = fixed.astype(dtype)

    def _ps(x):
        return jax.lax.psum(x, psum_axis) if psum_axis is not None else x

    def matvec(x):
        t = jnp.einsum("klim,ki->lm", Hpx, x, precision=_PREC)      # (L,3)
        y = _ps(jnp.einsum("klim,lm->ki", W, t, precision=_PREC))   # (K,6)
        out = (jnp.einsum("kij,kj->ki", Hpp, x, precision=_PREC)
               + fixed_f[:, None] * x - y)
        if H_extra is not None:
            out = out + jnp.matmul(
                H_extra, x.reshape(-1), precision=_PREC).reshape(K, 6)
        return out

    # block-diagonal preconditioner M_k = S_kk
    S_kk = Hpp - _ps(
        jnp.einsum("klim,kljm->kij", W, Hpx, precision=_PREC)
    ) + fixed_f[:, None, None] * jnp.eye(6, dtype=dtype)
    if H_extra is not None:
        Hx = H_extra.reshape(K, 6, K, 6)
        S_kk = S_kk + Hx[jnp.arange(K), :, jnp.arange(K), :]

    def prec(r):
        return jnp.linalg.solve(S_kk, r[..., None])[..., 0]

    x0 = jnp.zeros_like(rhs)
    r0 = rhs - matvec(x0)
    z0 = prec(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        active = rz > tol
        alpha = jnp.where(active, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 1e-30, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rz0), None,
                                   length=num_iters)
    return x


def _schur_step(prob: BAProblem, damp, huber_delta: float | None = None,
                reduced_solver: str = "dense", cg_iters: int = 32,
                lm_eig_floor: float | None = None,
                odo: OdoFactors | None = None,
                psum_axis: str | None = None,
                motion_only: bool = False):
    """One damped GN step via Schur elimination of the landmarks.

    With ``huber_delta``, IRLS reweighting (sqrt-weights folded into the
    residuals and Jacobians) turns the step into a robust GN step.
    ``reduced_solver``: "dense" materializes + solves the (6K, 6K)
    reduced system (exact; fine for small windows), "cg" runs
    matrix-free preconditioned CG (the K >~ 50 long-window path).

    ``lm_eig_floor``: spectral observability cutoff on the landmark
    blocks — eigen-directions of H_ll with eigenvalue below
    ``lm_eig_floor * lambda_max`` are treated as UNOBSERVED and get a
    zero update (truncated pseudo-inverse).  For a landmark seen under
    near-parallel rays (forward motion) the along-ray eigenvalue is
    ~ (baseline/depth)^2 of the cross-ray ones; without the cutoff,
    fixed-but-slightly-inconsistent poses place the least-squares
    optimum arbitrarily far along the ray and LM walks there.  With it,
    depth stays at its triangulated value until ~sqrt(floor) of
    baseline-to-depth ratio has accumulated.
    Returns (dpose (K,6), dlm (L,3)).
    """
    K, L = prob.mask.shape
    res, _ = ba_residuals(prob)
    Jp, Jx = _jacobians(prob)

    if huber_delta is not None:
        sw = jnp.sqrt(huber_weights(res, prob.mask, huber_delta))
        res = res * sw[..., None]
        Jp = Jp * sw[..., None, None]
        Jx = Jx * sw[..., None, None]

    # zero Jacobians of fixed poses => their update is exactly 0 and the
    # damped diagonal keeps S invertible
    Jp = jnp.where(prob.fixed_pose_mask[:, None, None, None], 0.0, Jp)

    # blocks — with psum_axis, pose-indexed reductions over the landmark
    # axis become local partials + one psum of small (K, 6[,6]) tensors
    Hpp = _psum(jnp.einsum("klri,klrj->kij", Jp, Jp, precision=_PREC),
                psum_axis)                                             # (K,6,6)
    Hxx = jnp.einsum("klri,klrj->lij", Jx, Jx, precision=_PREC)        # (L,3,3)
    Hpx = jnp.einsum("klri,klrj->klij", Jp, Jx, precision=_PREC)       # (K,L,6,3)
    bp = _psum(jnp.einsum("klri,klr->ki", Jp, res, precision=_PREC),
               psum_axis)                                              # (K,6)
    bx = jnp.einsum("klri,klr->li", Jx, res, precision=_PREC)          # (L,3)

    # Levenberg damping on both diagonals
    eyeK = jnp.eye(6, dtype=res.dtype)
    eyeL = jnp.eye(3, dtype=res.dtype)
    Hpp = Hpp + damp * eyeK * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-8
    )[..., None, :] * eyeK
    Hxx = Hxx + damp * eyeL * jnp.maximum(
        jnp.diagonal(Hxx, axis1=-2, axis2=-1), 1e-8
    )[..., None, :] * eyeL

    if motion_only is True:
        # landmarks FROZEN: Hxx^-1 = 0 collapses the Schur complement to
        # the pose block (W = 0, dlm = 0) — the pose-polish step of the
        # hybrid engine mode.  No spectral machinery touches the step,
        # so it is robust to near-singular landmark blocks by
        # construction (f32 eigh noise amplified by 1/lambda_min was
        # measured to poison joint steps on TPU; see docs/parity.md).
        Hxx_inv = jnp.zeros_like(Hxx)
    else:
        if lm_eig_floor is None:
            Hxx_inv = sym3x3_inverse(Hxx)  # (L,3,3)
        else:
            # closed-form Cardano eigensolver (ops/linalg.py): batched
            # jnp.linalg.eigh lowers to an iterative Jacobi sweep whose
            # f32 noise, amplified by 1/lambda_min on near-singular
            # blocks, poisoned joint landmark steps on TPU (parity.md
            # deviation #8, now resolved); the analytic roots have no
            # iteration noise.
            Hxx_inv = sym3x3_trunc_pinv(Hxx, lm_eig_floor)
        if not isinstance(motion_only, bool):
            # TRACED gate (the engine's turnover-routed polish,
            # VOConfig.polish_joint_turnover): one program serves both
            # the joint step and the landmarks-frozen polish step
            Hxx_inv = jnp.where(motion_only, jnp.zeros_like(Hxx_inv),
                                Hxx_inv)

    # Schur complement: S = Hpp - sum_l Hpx Hxx^-1 Hxp
    W = jnp.einsum("klij,ljm->klim", Hpx, Hxx_inv, precision=_PREC)    # (K,L,6,3)
    rhs = bp - _psum(jnp.einsum("klim,lm->ki", W, bx, precision=_PREC),
                     psum_axis)                                        # (K,6)
    fixed = prob.fixed_pose_mask

    H_odo = None
    if odo is not None:
        # pose-indexed only: computed identically (replicated) on every
        # landmark shard, added after the psums
        H_odo, b_odo, _ = _odo_system(prob.poses, odo, fixed)
        rhs = rhs + b_odo

    if reduced_solver == "cg":
        dpose = schur_cg_solve(Hpp, W, Hpx, fixed, rhs, num_iters=cg_iters,
                               H_extra=H_odo, psum_axis=psum_axis)
    else:
        S_off = _psum(
            jnp.einsum("klim,qljm->kiqj", W, Hpx, precision=_PREC),
            psum_axis)                                                 # (K,6,K,6)
        S = -S_off
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp)
        if H_odo is not None:
            S = S + H_odo.reshape(K, 6, K, 6)
        # keep fixed poses' rows/cols well-conditioned (their J is zero)
        diag_boost = (fixed.astype(res.dtype))[:, None] * jnp.ones(6, res.dtype)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.eye(6, dtype=res.dtype) * diag_boost[..., None, :] * jnp.eye(6, dtype=res.dtype)
        )
        dpose = jnp.linalg.solve(
            S.reshape(6 * K, 6 * K), rhs.reshape(-1)
        ).reshape(K, 6)
    dpose = dpose * (~fixed)[:, None]

    # back-substitute landmarks: dx = Hxx^-1 (bx - Hxp dpose)
    t = bx - jnp.einsum("klij,ki->lj", Hpx, dpose, precision=_PREC)
    dlm = jnp.einsum("lij,lj->li", Hxx_inv, t, precision=_PREC)
    return dpose, dlm


def _total_cost(prob: BAProblem, odo: OdoFactors | None,
                huber_delta: float | None, psum_axis: str | None = None):
    """(residuals, scalar cost) including the odometry-prior term."""
    res, err = ba_residuals(prob, huber_delta, psum_axis)
    if odo is not None:
        cnt = jnp.maximum(_psum(jnp.sum(prob.mask), psum_axis), 1)
        r = odo_residuals(prob.poses, odo)
        err = err + jnp.sum(r * r) / (2.0 * cnt)
    return res, err


def ba_solve(prob: BAProblem, num_iters: int = 10, damp_init: float = 1e-3,
             damp_up: float = 10.0, damp_down: float = 10.0,
             huber_delta: float | None = None,
             reduced_solver: str = "dense", cg_iters: int = 32,
             lm_step_clip: float | None = None,
             per_landmark_accept: bool = False,
             damp_min: float = 0.0,
             lm_eig_floor: float | None = None,
             odo: OdoFactors | None = None,
             psum_axis: str | None = None,
             motion_only: bool = False):
    """Levenberg-Marquardt loop with accept/reject on the total error.

    ``motion_only``: hold the LANDMARKS fixed and refine only the poses
    (dlm = 0 exactly) — the hybrid engine mode's pose-polish phase.

    ``huber_delta`` (pixels) turns on Huber-robust IRLS weighting —
    outlier observations beyond delta contribute linearly, so a bad
    correspondence cannot drag the window.  ``reduced_solver="cg"``
    switches the reduced camera system to matrix-free PCG for long
    windows (see ``schur_cg_solve``).

    Low-parallax guards (needed whenever rays to a landmark are nearly
    parallel — e.g. forward motion — where H_ll is near-singular along the
    ray, and relative Levenberg damping vanishes with the diagonal):

    - ``lm_step_clip``: per-iteration trust region — each landmark's
      step is scaled so ``|dX| <= lm_step_clip * dist(X, nearest
      observing camera)``.  Scale-free, so one setting covers any scene
      scale; it bounds ray-sliding to a geometric rate without touching
      well-conditioned updates.
    - ``per_landmark_accept``: accept/reject each landmark's step on its
      OWN robust cost (the structure problem is separable when poses are
      fixed, so this is exact block-coordinate LM; with floating poses
      landmark costs are evaluated at the candidate poses).
    - ``damp_min``: floor for the Levenberg parameter.

    ``psum_axis``: run inside ``shard_map`` over the LANDMARK axis —
    landmarks/obs/mask are the local shard, poses are replicated, and
    every pose-indexed reduction psums over the named axis (see
    ba/distributed.py for the shard_map wrapper).

    Returns (poses, landmarks, info) with info = (final msq, initial msq).
    """

    def step(carry, _):
        poses, lms, damp, err = carry
        p0 = prob._replace(poses=poses, landmarks=lms)
        dpose, dlm = _schur_step(p0, damp, huber_delta,
                                 reduced_solver=reduced_solver,
                                 cg_iters=cg_iters,
                                 lm_eig_floor=lm_eig_floor,
                                 odo=odo,
                                 psum_axis=psum_axis,
                                 motion_only=motion_only)
        if lm_step_clip is not None:
            centers = jax.vmap(lambda p: lie.camera_center(lie.se3_exp(p)))(
                poses)                                              # (K,3)
            d = jnp.linalg.norm(lms[None, :, :] - centers[:, None, :],
                                axis=-1)                            # (K,L)
            d_near = jnp.min(jnp.where(prob.mask, d, jnp.inf), axis=0)
            d_near = jnp.where(jnp.isfinite(d_near), d_near, 1.0)
            dn = jnp.linalg.norm(dlm, axis=1)
            scale = jnp.minimum(1.0, lm_step_clip * d_near
                                / jnp.maximum(dn, 1e-12))
            dlm = dlm * scale[:, None]
        cand = prob._replace(poses=poses + dpose, landmarks=lms + dlm)
        res_new, err_new = _total_cost(cand, odo, huber_delta, psum_axis)
        if per_landmark_accept:
            res_old, _ = ba_residuals(
                prob._replace(poses=cand.poses, landmarks=lms), huber_delta)
            cl_old = _per_landmark_cost(res_old, prob.mask, huber_delta)
            cl_new = _per_landmark_cost(res_new, prob.mask, huber_delta)
            ok_l = (cl_new <= cl_old) & \
                jnp.all(jnp.isfinite(cand.landmarks), axis=1)
            ok = err_new < err
            poses = jnp.where(ok, cand.poses, poses)
            lms = jnp.where(ok_l[:, None], cand.landmarks, lms)
            _, err = _total_cost(
                prob._replace(poses=poses, landmarks=lms), odo, huber_delta,
                psum_axis)
        else:
            ok = err_new < err
            poses = jnp.where(ok, cand.poses, poses)
            lms = jnp.where(ok, cand.landmarks, lms)
            err = jnp.where(ok, err_new, err)
        damp = jnp.maximum(jnp.where(ok, damp / damp_down, damp * damp_up),
                           damp_min)
        return (poses, lms, damp, err), err

    _, err0 = _total_cost(prob, odo, huber_delta, psum_axis)
    (poses, lms, _, err), _ = jax.lax.scan(
        step,
        (prob.poses, prob.landmarks, jnp.asarray(damp_init, prob.poses.dtype), err0),
        None,
        length=num_iters,
    )
    return poses, lms, (err, err0)
