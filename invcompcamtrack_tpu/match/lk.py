"""Sparse pyramidal inverse-compositional Lucas-Kanade point tracking.

The self-contained replacement for the reference's external OF_DIS flow
binary in the point-tracking workloads (reference shells out per frame
pair: run_OF_point_track.py.ipynb cell 2; SURVEY.md §7 item 5).  It is
the 2-DoF (pure translation) sibling of the 6-DoF IC-GN pose solver in
``solver/icgn.py`` and reuses the same patch machinery:

per level (coarse -> fine), per point:
  - extract reference patch + gradients once; 2x2 Hessian of [dx, dy],
  - iterate: sample query patch at current position, residual
    ``ref - query``, delta = H^{-1} J^T r, position += delta,
with frustum-invalid points frozen.  All points run as one batched
program per level; iterations are a fixed-trip masked scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.image.patch import extract_patches, extract_patches_grad
from invcompcamtrack_tpu.image.pyramid import Pyramid
from invcompcamtrack_tpu.ops.window_sample import (
    gather_windows_any,
    sample_from_windows,
    window_origin,
)

_PREC = jax.lax.Precision.HIGHEST


def track_points_lk(pyr_a: Pyramid, pyr_b: Pyramid, xy: jnp.ndarray,
                    psz: int = 8, padding: int | None = None,
                    num_levels: int | None = None, max_iters: int = 8,
                    eps: float = 0.03, min_det: float = 1e-6,
                    init_xy: jnp.ndarray | None = None,
                    window_cache: bool = True):
    """Track points from image A to image B.

    pyr_a/pyr_b: pyramids (same builder as the pose solver).
    xy: (N, 2) positions in image A (level-0 unpadded coords).
    init_xy: optional initial guesses in image B (e.g. an expected
    disparity for stereo matching) — widens the convergence basin far
    beyond the pyramid's reach.
    Returns (xy_b (N, 2), valid (N,)).
    """
    if padding is None:
        padding = psz
    if num_levels is None:
        num_levels = len(pyr_a)
    L = num_levels

    # guesses start at the coarsest level, in that level's coordinates
    start = xy if init_xy is None else init_xy
    guess = start / (2.0 ** (L - 1))
    valid = jnp.all(jnp.isfinite(xy), axis=1)

    for s in range(L - 1, -1, -1):
        scale = 2.0**s
        xy_s = xy / scale
        lvl_a, lvl_b = pyr_a[s], pyr_b[s]
        H_img = lvl_a.img.shape[0] - 2 * padding
        W_img = lvl_a.img.shape[1] - 2 * padding

        ref, gx, gy = extract_patches_grad(
            lvl_a.img, lvl_a.dx, lvl_a.dy, xy_s, psz, padding
        )
        N = ref.shape[0]
        gxf = gx.reshape(N, -1)
        gyf = gy.reshape(N, -1)
        h00 = jnp.sum(gxf * gxf, axis=1)
        h01 = jnp.sum(gxf * gyf, axis=1)
        h11 = jnp.sum(gyf * gyf, axis=1)
        det = h00 * h11 - h01 * h01
        good = valid & (det > min_det) & _inb(xy_s, W_img, H_img)
        inv00 = jnp.where(good, h11 / jnp.where(good, det, 1.0), 0.0)
        inv01 = jnp.where(good, -h01 / jnp.where(good, det, 1.0), 0.0)
        inv11 = jnp.where(good, h00 / jnp.where(good, det, 1.0), 0.0)
        reff = ref.reshape(N, -1)

        if window_cache:
            # cache query windows at the level-entry guesses; iterations
            # resample densely (same trick as the pose solver)
            win = psz + 8
            g0 = jnp.where(jnp.isfinite(guess), guess, 0.0)
            origins = window_origin(g0, psz, win, padding)
            qwin = gather_windows_any(lvl_b.img, origins, win)

        def step(carry, _):
            pos, active = carry
            if window_cache:
                q = sample_from_windows(qwin, origins, pos, psz, padding
                                        ).reshape(N, -1)
            else:
                q = extract_patches(lvl_b.img, pos, psz, padding).reshape(N, -1)
            r = reff - q
            bx = jnp.sum(gxf * r, axis=1)
            by = jnp.sum(gyf * r, axis=1)
            dx = inv00 * bx + inv01 * by
            dy = inv01 * bx + inv11 * by
            act = active & (jnp.abs(dx) + jnp.abs(dy) > eps) & _inb(pos, W_img, H_img)
            pos = pos + jnp.where(act[:, None], jnp.stack([dx, dy], 1), 0.0)
            return (pos, active), None

        (guess, _), _ = jax.lax.scan(
            step, (guess, good), None, length=max_iters
        )
        valid = valid & _inb(guess, W_img, H_img)
        if s > 0:
            guess = guess * 2.0

    return guess, valid


def _inb(p, W, H):
    return (p[:, 0] >= 0) & (p[:, 1] >= 0) & (p[:, 0] <= W) & (p[:, 1] <= H)


def lk_forward_backward(pyr_a: Pyramid, pyr_b: Pyramid, xy: jnp.ndarray,
                        ratio_th: float = 0.2, abs_th: float = 1.0,
                        init_xy: jnp.ndarray | None = None, **kw):
    """Forward/backward verified tracking — same gate as the flow-transfer
    tracker (reference: classoftrack.py:85-93).  Returns (xy_b, valid).

    ``init_xy`` seeds only the forward pass (an expected position in B,
    e.g. a reprojection); the backward pass is seeded at the original
    ``xy``, which is the correct prior for the return trip.
    """
    xy_b, ok_f = track_points_lk(pyr_a, pyr_b, xy, init_xy=init_xy, **kw)
    back_init = xy if init_xy is not None else None
    xy_back, ok_b = track_points_lk(pyr_b, pyr_a, xy_b, init_xy=back_init, **kw)
    err = jnp.linalg.norm(xy - xy_back, axis=1)
    disp = jnp.linalg.norm(xy - xy_b, axis=1)
    gate = (err / jnp.maximum(disp, 1e-12) < ratio_th) & (err < abs_th)
    return xy_b, ok_f & ok_b & gate
