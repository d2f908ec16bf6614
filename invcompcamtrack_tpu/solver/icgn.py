"""Inverse-compositional Gauss-Newton 6-DoF pose refinement.

The TPU re-design of the reference's ``OdometerClass`` hot path
(reference: odometer.cpp:257-515, call stack documented in SURVEY.md §3.1).
Differences from the C++ are *structural*, not semantic:

- per-point pointer loops become ``(N, ...)`` tensor ops; the 6
  steepest-descent planes become one ``(N, 6, psz*psz)`` tensor,
- the 21-term Hessian accumulation becomes a single ``S S^T`` matmul on
  the MXU (reference: odometer.cpp:428-507),
- the memset-padding tricks become explicit validity masks.  In
  particular, points outside the frustum get **zeroed** steepest-descent
  entries, where the reference kept *stale values from the coarser scale*
  (reference: odometer.cpp:302-328 vs :580-609) — a quirk documented in
  SURVEY.md §3.1 that we deliberately fix; test
  ``test_icgn.py::test_masking_semantics`` pins the new behavior,
- the data-dependent iteration count (reference: odometer.cpp:344-345)
  becomes a ``lax.while_loop`` with the same predicate
  ``(it < maxiter) & (normdp/normdp_init > normdp_ratio)``; under vmap
  XLA converts it to a masked fixed-point loop automatically,
- the pose update stays **additive in coefficient space** followed by
  re-exponentiation (reference: pose.cpp:116-129) — NOT group
  composition — because trajectory parity requires it.

Everything is a pure function of its inputs; scale count, patch size and
iteration bound are static (from ``ICGNParams``), so one compilation
serves a whole sequence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core import pose as pose_ops
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.patch import extract_patches, extract_patches_grad
from invcompcamtrack_tpu.image.pyramid import Pyramid
from invcompcamtrack_tpu.ops import icgn_iter_pallas as fused_iter
from invcompcamtrack_tpu.ops.linalg import cholesky_solve_sym
from invcompcamtrack_tpu.ops.window_sample import (
    gather_windows_any,
    sample_from_windows,
    window_origin,
)

_PREC = jax.lax.Precision.HIGHEST

# The reference seeds both norm trackers with 1e-10 so the ratio test is
# exactly 1 on entry -> the first iteration always runs for ratio < 1
# (reference: odometer.cpp:341-345).
_NORMDP_INIT = 1e-10


class ICGNAux(NamedTuple):
    """Per-scale diagnostics (coarse -> fine order)."""

    iters: jnp.ndarray        # (S,) iterations executed per scale
    normdp: jnp.ndarray       # (S,) final |dp|_1 per scale
    valid_ref: jnp.ndarray    # (S,) number of in-frustum reference points
    hessian: jnp.ndarray | None = None  # (..., 6, 6) finest-scale GN
    #   normal matrix, mapped back to the CALLER pose coordinates
    #   (donorm unfolded).  This is the photometric Fisher information
    #   of the measured pose up to the 1/sigma_I^2 image-noise factor —
    #   the information-weighted odometry prior of the window BA
    #   (vo/engine.py) is built from it.


def sd_jacobian_rows(Xc, fx, fy):
    """Per-point pinhole Jacobian rows (jx, jy), each (..., N, 6)
    (reference comment odometer.cpp:314-315):
      J = [ fx/z, 0,    -fx x/z^2, -fx x y/z^2,      fx(1 + x^2/z^2), -fx y/z ]
          [ 0,    fy/z, -fy y/z^2, -fy(1 + y^2/z^2), fy x y/z^2,       fy x/z ]

    The rows are constant over a patch, so every steepest-descent plane
    factors as sd_k = jx_k * p_dx + jy_k * p_dy — the structure behind
    the reference's 21-term Hessian accumulation (odometer.cpp:428-507)
    and this solver's moment-based fast path.
    """
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zsq = z * z
    jx = jnp.stack(
        [
            fx / z,
            jnp.zeros_like(z),
            -x / zsq * fx,
            -x * y / zsq * fx,
            (1.0 + x * x / zsq) * fx,
            -y / z * fx,
        ],
        axis=-1,
    )  # (N, 6)
    jy = jnp.stack(
        [
            jnp.zeros_like(z),
            fy / z,
            -y / zsq * fy,
            -(1.0 + y * y / zsq) * fy,
            x * y / zsq * fy,
            x / z * fy,
        ],
        axis=-1,
    )
    return jx, jy


def steepest_descent_images(p_dx, p_dy, Xc, fx, fy):
    """Build the 6 steepest-descent planes from gradient patches and
    camera-frame points (reference: odometer.cpp:302-328).

    p_dx, p_dy: (N, psz, psz) gradient patches at the reference view.
    Xc: (N, 3) points rotated into the reference camera frame.
    Returns (N, 6, psz, psz): sd_k = jx_k * p_dx + jy_k * p_dy.
    """
    jx, jy = sd_jacobian_rows(Xc, fx, fy)
    return (
        jx[..., :, None, None] * p_dx[..., None, :, :]
        + jy[..., :, None, None] * p_dy[..., None, :, :]
    )


def _track_one_scale(level_ref, level_new, Xn, Xc_ref, uv_ref, p, cam_level,
                     cfg: ICGNParams, point_mask=None, scale_index: int = 0):
    """Run the GN iterations of one pyramid scale; returns updated pose.

    Batch-native: every array may carry arbitrary leading batch dims
    (..., N, ...) over a SHARED image pair — the whole RANSAC sample
    batch is one program, one patch-gather kernel call per iteration
    (replacing the reference's sequential sample loop,
    run_track_nposes.cpp:193).  Per-sample convergence is a mask
    (converged samples freeze), reproducing vmapped-while semantics.
    """
    fx, fy, cx, cy, swo, sho = cam_level
    lead = Xn.shape[:-2]
    N = Xn.shape[-2]
    npix = cfg.novals

    # [4] reference patches + gradients, frustum mask (+ optional
    # per-point selection mask, the RANSAC-inlier-subset equivalent).
    # Chirality: a point BEHIND the camera projects through the pinhole
    # to a mirrored uv that can land inside the image bounds, so the
    # bounds check alone would admit its garbage residuals (the
    # reference never sees such points — its callers pre-filter; the VO
    # engine here cannot, landmarks drift behind the camera routinely).
    valid_ref = pose_ops.in_frustum(uv_ref, swo, sho) & (Xc_ref[..., 2] > 0)
    if point_mask is not None:
        valid_ref = valid_ref & point_mask
    # NaN/inf projections (degenerate points at z ~ 0) poison the
    # bilinear weights before any output mask can zero them; sample
    # invalid points at a harmless fixed position instead.
    uv_ref = jnp.where(valid_ref[..., None], uv_ref, jnp.zeros_like(uv_ref))

    use_fused = cfg.window_cache and fused_iter.supported(
        cfg.psz, cfg.window_size, uv_ref.dtype)
    qwin = origins = None
    if use_fused:
        # ONE dual-gather launch per scale: reference patches (+ in-
        # kernel gradients) and the query-window cache share the point
        # loop (ops/patch_pallas.py::gather_ref_grad_and_windows)
        from invcompcamtrack_tpu.ops.patch_pallas import (
            gather_ref_grad_and_windows)

        G_entry = lie.se3_exp(p)
        uv_entry = pose_ops.project_points(G_entry, Xn, fx, fy, cx, cy)
        uv_entry = jnp.where(
            jnp.isfinite(uv_entry) & valid_ref[..., None], uv_entry, 0.0
        )
        origins = window_origin(uv_entry, cfg.psz, cfg.window_size,
                                cam_level_padding(cfg))
        from invcompcamtrack_tpu.ops import patch_prefetch

        if cfg.gather_prefetch and patch_prefetch.supported(
                cfg.psz, cfg.window_size, uv_ref.dtype,
                shape=level_ref.img.shape):
            # prefetch-pipelined variant: per-point block DMA named by
            # scalar-prefetched index words — bit-identical outputs but
            # measured 2.1x SLOWER than the shipped kernel on TPU v5e
            # (docs/kernels.md); kept as the recorded redesign attempt
            p_img, p_dx, p_dy, qwin = (
                patch_prefetch.gather_ref_grad_and_windows_prefetch(
                    level_ref.img, level_new.img, uv_ref, origins,
                    cfg.psz, cam_level_padding(cfg), cfg.window_size,
                    patch_norm=cfg.dopatchnorm))
        else:
            p_img, p_dx, p_dy, qwin = gather_ref_grad_and_windows(
                level_ref.img, level_new.img, uv_ref, origins, cfg.psz,
                cam_level_padding(cfg), cfg.window_size,
                patch_norm=cfg.dopatchnorm,
                force_split=cfg.gather_split,
            )
    else:
        p_img, p_dx, p_dy = extract_patches_grad(
            level_ref.img, level_ref.dx, level_ref.dy, uv_ref, cfg.psz,
            cam_level_padding(cfg), patch_norm=cfg.dopatchnorm,
        )
    # [5] steepest-descent structure, masked (explicit-zero semantics).
    # Invalid points may sit at z ~ 0 (e.g. empty landmark slots); the
    # Jacobian divides by z, and inf * 0-mask = NaN — so sanitize the
    # camera-frame points BEFORE the division, then mask.
    Xc_safe = jnp.where(valid_ref[..., None], Xc_ref, jnp.ones_like(Xc_ref))

    # fused-iteration fast path: the GN iteration body (window resample
    # + residual + gradient projection) runs as ONE Pallas kernel per
    # iteration (ops/icgn_iter_pallas.py).  The 6 sd planes factor as
    # sd_k = jx_k p_dx + jy_k p_dy with per-point Jacobian rows, so the
    # Hessian reduces to 3 patch moments (a, b, c) contracted with
    # jx/jy outer products (the reference's 21-term accumulation,
    # odometer.cpp:428-507) and the per-pixel iteration work to two
    # projections (gx, gy) — the (N, 6, npix) sd tensor never exists.
    if use_fused:
        jx, jy = sd_jacobian_rows(Xc_safe, fx, fy)       # lead+(N,6)
        vmask = valid_ref[..., None].astype(p_img.dtype)
        jx = jx * vmask
        jy = jy * vmask
        pdx_s = fused_iter.to_strided(p_dx)              # lead+(N,128)
        pdy_s = fused_iter.to_strided(p_dy)
        a_m = jnp.sum(pdx_s * pdx_s, axis=-1)            # lead+(N,)
        b_m = jnp.sum(pdx_s * pdy_s, axis=-1)
        c_m = jnp.sum(pdy_s * pdy_s, axis=-1)
        H = (
            jnp.einsum("...nk,...nl,...n->...kl", jx, jx, a_m, precision=_PREC)
            + jnp.einsum("...nk,...nl,...n->...kl", jx, jy, b_m, precision=_PREC)
            + jnp.einsum("...nk,...nl,...n->...kl", jy, jx, b_m, precision=_PREC)
            + jnp.einsum("...nk,...nl,...n->...kl", jy, jy, c_m, precision=_PREC)
        )
        # the per-iteration planes may be stored bf16
        store_dt = jnp.bfloat16 if cfg.bf16_gather else p_img.dtype
        n_str = fused_iter.PSZ * fused_iter.WIN
        ref_s = fused_iter.to_strided(
            p_img * valid_ref[..., None, None].astype(p_img.dtype)
        ).astype(store_dt).reshape(-1, n_str)
        pdx_f = pdx_s.astype(store_dt).reshape(-1, n_str)
        pdy_f = pdy_s.astype(store_dt).reshape(-1, n_str)
        sd_flat = None
        ref_flat = None
    else:
        sd = steepest_descent_images(p_dx, p_dy, Xc_safe, fx, fy)
        sd = sd * valid_ref[..., None, None, None].astype(sd.dtype)
        sd_flat = sd.reshape(lead + (N, 6, npix))
        # [6] 6x6 Hessian: one MXU contraction over (point, pixel) pairs
        H = jnp.einsum("...nkp,...nlp->...kl", sd_flat, sd_flat,
                       precision=_PREC)
        ref_flat = (
            p_img * valid_ref[..., None, None].astype(p_img.dtype)
        ).reshape(lead + (N, npix))

    if cfg.window_cache and not use_fused:
        # cache local query-image windows at the scale-entry projections;
        # iterations resample from the dense tensor (no per-iter gather)
        G_entry = lie.se3_exp(p)
        uv_entry = pose_ops.project_points(G_entry, Xn, fx, fy, cx, cy)
        uv_entry = jnp.where(
            jnp.isfinite(uv_entry) & valid_ref[..., None], uv_entry, 0.0
        )
        origins = window_origin(uv_entry, cfg.psz, cfg.window_size,
                                cam_level_padding(cfg))
        qwin = gather_windows_any(level_new.img, origins, cfg.window_size)
    if use_fused:
        qwin_flat = qwin.reshape(
            -1, cfg.window_size * cfg.window_size
        ).astype(jnp.bfloat16 if cfg.bf16_gather else qwin.dtype)

    def cond(state):
        it, _p, _G, _normdp, _normdp_init, active = state
        return (it < cfg.maxiter) & jnp.any(active)

    def body(state):
        it, p_cur, G_cur, normdp, normdp_init, active = state
        # [7] project with current pose (chirality-gated, as for the
        # reference view above)
        uv_new, Xc_new = pose_ops.project_points(G_cur, Xn, fx, fy, cx, cy,
                                                 return_cam=True)
        valid_new = (pose_ops.in_frustum(uv_new, swo, sho) & valid_ref
                     & (Xc_new[..., 2] > 0))
        uv_new = jnp.where(valid_new[..., None], uv_new, jnp.zeros_like(uv_new))
        # [8]+[9a] query patches + error image + sd projection
        if use_fused:
            # same tap math as sample_from_windows, folded into the kernel
            pad = cam_level_padding(cfg)
            n_off = cfg.window_size - cfg.psz
            u0 = jnp.ceil(uv_new[..., 0] + 1e-5).astype(jnp.int32)
            v0 = jnp.ceil(uv_new[..., 1] + 1e-5).astype(jnp.int32)
            rx = uv_new[..., 0] - jnp.floor(uv_new[..., 0])
            ry = uv_new[..., 1] - jnp.floor(uv_new[..., 1])
            row_w = jnp.clip(v0 - cfg.psz // 2 - 1 + pad - origins[..., 0],
                             0, n_off - 1)
            col_w = jnp.clip(u0 - cfg.psz // 2 - 1 + pad - origins[..., 1],
                             0, n_off - 1)
            wts = jnp.stack([rx * ry, (1 - rx) * ry, rx * (1 - ry),
                             (1 - rx) * (1 - ry)], axis=-1)
            g = fused_iter.fused_resample_project(
                qwin_flat, ref_s, pdx_f, pdy_f,
                row_w.reshape(-1), col_w.reshape(-1),
                wts.reshape(-1, 4).astype(jnp.float32),
                valid_new.reshape(-1), patch_norm=cfg.dopatchnorm,
            ).reshape(lead + (N, 2))
            # rhs_k = sum_n jx_nk gx_n + jy_nk gy_n (tiny contraction;
            # the (N, 6, npix) sd tensor never enters the loop)
            rhs = (
                jnp.einsum("...nk,...n->...k", jx, g[..., 0], precision=_PREC)
                + jnp.einsum("...nk,...n->...k", jy, g[..., 1], precision=_PREC)
            )
        else:
            if cfg.window_cache:
                q = sample_from_windows(
                    qwin, origins, uv_new, cfg.psz, cam_level_padding(cfg),
                    patch_norm=cfg.dopatchnorm,
                ).reshape(lead + (N, npix))
            else:
                q = extract_patches(
                    level_new.img, uv_new, cfg.psz, cam_level_padding(cfg),
                    patch_norm=cfg.dopatchnorm,
                ).reshape(lead + (N, npix))
            pdiff = (ref_flat - q) * valid_new[..., None].astype(q.dtype)
            # rhs_k = sum_{n,p} sd[n,k,p] * pdiff[n,p]
            rhs = jnp.einsum("...nkp,...np->...k", sd_flat, pdiff,
                             precision=_PREC)
        # [9b] solve 6x6 normal equations.  The reference used fullPivLu
        # (odometer.cpp:509-515) and noted llt as fastest; batched LU on
        # TPU lowers to pivot loops (~1.8us/solve), so we use an
        # unrolled guarded Cholesky (H is the GN normal matrix: SPD).
        delta = cholesky_solve_sym(H, rhs)
        delta = delta * active[..., None].astype(delta.dtype)
        # [10] additive coefficient update + re-exponentiation
        p_next = p_cur + delta
        G_next = lie.se3_exp(p_next)
        ndp_new = jnp.sum(jnp.abs(delta), axis=-1)
        ndp = jnp.where(active, ndp_new, normdp)
        ndp_init = jnp.where(active & (it == 0), ndp_new, normdp_init)
        active_next = active & ((ndp / ndp_init) > cfg.normdp_ratio)
        if cfg.verbosity >= 2:
            # the reference's per-iteration print (odometer.cpp:416-417);
            # batched runs report the mean |dp| over active samples
            jax.debug.print(
                "Sc{s:02d},It{i:02d}: {v}", s=scale_index, i=it,
                v=jnp.mean(ndp), ordered=False,
            )
        return (it + 1, p_next, G_next, ndp, ndp_init, active_next)

    init_norm = jnp.full(lead, _NORMDP_INIT, p.dtype)
    init = (
        jnp.zeros((), jnp.int32),
        p,
        lie.se3_exp(p),
        init_norm,
        init_norm,
        jnp.ones(lead, bool),
    )
    it, p_out, _G, normdp, _, _ = jax.lax.while_loop(cond, body, init)
    return p_out, (it, normdp, jnp.sum(valid_ref, axis=-1), H)


def cam_level_padding(cfg: ICGNParams) -> int:
    """Pyramid levels are padded by psz (reference: imgpadding = psz,
    run_io_reprojection_test.cpp:157)."""
    return cfg.psz


def track_pose(pyr_ref: Pyramid, pyr_new: Pyramid, X: jnp.ndarray,
               p_init: jnp.ndarray, cam: CameraPyramid, cfg: ICGNParams,
               point_mask: jnp.ndarray | None = None,
               return_aux: bool = False):
    """Track the 6-DoF pose aligning reference patches to the new image.

    pyr_ref/pyr_new: pyramids with >= cfg.lv_f + 1 levels, padded by psz.
    X: (N, 3) world points (visible in the reference view).
    p_init: (6,) initial pose, se(3) coefficients of [R | t] world->cam.
    Returns the refined pose (and optional per-scale diagnostics).

    The full equivalent of Set3Dpoints + SetPose + TrackPose
    (reference: odometer.cpp:171-426).
    """
    dtype = p_init.dtype
    X = X.astype(dtype)

    if cfg.donorm:
        Xn, mean, varval = pose_ops.normalize_points(X, mask=point_mask)
        p = pose_ops.normalize_pose(p_init, mean, varval)
    else:
        Xn, mean, varval = X, None, None
        p = p_init

    # [2/3] initial reprojection per scale; camera-frame points are
    # computed ONCE at the initial pose and reused for all scales'
    # Jacobians — the inverse-compositional approximation
    # (reference: odometer.cpp:241-255).
    G0 = lie.se3_exp(p)  # (..., 3, 4); all downstream ops batch-broadcast
    Xc_ref = pose_ops.transform_points(G0, Xn)
    uv_ref = {}
    for s in range(cfg.lv_l, cfg.lv_f + 1):
        fx, fy, cx, cy, _, _ = cam.level(s)
        uv_ref[s] = pose_ops.project_points(G0, Xn, fx, fy, cx, cy)

    iters, normdps, validcnt = [], [], []
    H_fine = None
    for s in range(cfg.lv_f, cfg.lv_l - 1, -1):  # coarse -> fine
        p, (it, ndp, vc, H_fine) = _track_one_scale(
            pyr_ref[s], pyr_new[s], Xn, Xc_ref, uv_ref[s], p, cam.level(s), cfg,
            point_mask=point_mask, scale_index=s,
        )
        iters.append(it)
        normdps.append(ndp)
        validcnt.append(vc)

    if cfg.donorm:
        p = pose_ops.unnormalize_pose(p, mean, varval)

    if return_aux:
        if cfg.donorm:
            # the GN Hessian lives in NORMALIZED pose coordinates
            # p_n = normalize_pose(p, mean, varval); map it back:
            # cost = dp_n^T H dp_n, dp_n = B dp  =>  H_u = B^T H B
            def _jac6(q, m, v):
                return jax.jacfwd(
                    lambda z: pose_ops.normalize_pose(z, m, v))(q)

            jacf = _jac6
            for _ in range(p.ndim - 1):
                jacf = jax.vmap(jacf)
            B = jacf(p, mean, varval)
            H_fine = jnp.einsum("...ji,...jk,...kl->...il", B, H_fine, B,
                                precision=jax.lax.Precision.HIGHEST)
        aux = ICGNAux(
            iters=jnp.stack(iters),
            normdp=jnp.stack(normdps),
            valid_ref=jnp.stack(validcnt),
            hessian=H_fine,
        )
        return p, aux
    return p


def track_pose_batch(pyr_ref: Pyramid, pyr_new: Pyramid, X: jnp.ndarray,
                     p_init: jnp.ndarray, cam: CameraPyramid, cfg: ICGNParams,
                     point_mask: jnp.ndarray | None = None):
    """Batched tracking: shared image pair, per-sample point sets + poses.

    X: (B, N, 3); p_init: (B, 6); optional point_mask (B, N) -> (B, 6).

    The solver is batch-native (no vmap): the whole RANSAC sample batch
    runs as one device program, with one Pallas gather call per
    iteration over all B*N points (replacing the reference's sequential
    sample loop, run_track_nposes.cpp:193).
    """
    return track_pose(pyr_ref, pyr_new, X, p_init, cam, cfg,
                      point_mask=point_mask)
