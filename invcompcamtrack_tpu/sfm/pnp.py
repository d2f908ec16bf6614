"""Batched linear PnP (DLT) pose-from-correspondences.

Replaces the reference's external ASPnP dependency
(reference: func_ransac_fitcameras_odom.m:40; SURVEY.md §7 item 5).
The reference samples 4 correspondences because ASPnP handles minimal
sets; the TPU-native design instead runs a *linear* 6+-point DLT solver
over a much larger hypothesis batch — hypotheses are nearly free when
vmapped, so sample count substitutes for minimal-set algebra.

Given normalized image points x_n = K^{-1} x, solve for the 3x4 matrix
[R|t] with ``x_n ~ [R|t] X`` via the standard DLT system (Hartley &
Zisserman ch. 7), as the eigenvector of the 12x12 normal matrix with the
smallest eigenvalue, then project onto SE(3): SVD-orthogonalize R, fix
``det R = +1``, recover scale from ``det`` and the chirality sign from
the mean depth of the sample points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def pnp_dlt(Xw: jnp.ndarray, xn: jnp.ndarray, weights=None):
    """Xw: (..., n, 3) world points; xn: (..., n, 2) normalized image
    coords (K already removed).  n >= 6.  Returns G: (..., 3, 4) = [R|t]
    with x_cam = R X + t, plus a degeneracy flag (..., ) (True = bad).
    """
    n = Xw.shape[-2]
    ones = jnp.ones_like(Xw[..., :1])
    Xh = jnp.concatenate([Xw, ones], axis=-1)  # (..., n, 4)
    zero = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    # rows: [X 0 -u*X ; 0 X -v*X] for P = rows of [R|t]
    r1 = jnp.concatenate([Xh, zero, -u * Xh], axis=-1)  # (..., n, 12)
    r2 = jnp.concatenate([zero, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2n, 12)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=-1)[..., None]
        A = A * w
    AtA = jnp.einsum("...ki,...kj->...ij", A, A, precision=_PREC)
    # smallest eigenvector of a 12x12 symmetric matrix
    evals, evecs = jnp.linalg.eigh(AtA)
    p = evecs[..., :, 0]
    G = p.reshape(p.shape[:-1] + (3, 4))

    # scale + chirality: mean depth of the sample must be positive
    R_raw = G[..., :3]
    det = jnp.linalg.det(R_raw)
    scale = jnp.sign(det) * jnp.abs(det) ** (1.0 / 3.0)
    degenerate = jnp.abs(scale) < 1e-12
    scale = jnp.where(degenerate, 1.0, scale)
    G = G / scale[..., None, None]
    depth = jnp.einsum("...j,...nj->...n", G[..., 2, :3], Xw, precision=_PREC) + G[..., 2, 3][..., None]
    flip = jnp.mean(depth, axis=-1) < 0
    G = jnp.where(flip[..., None, None], -G, G)

    # project R onto SO(3)
    U, _, Vt = jnp.linalg.svd(G[..., :3])
    R = jnp.matmul(U, Vt, precision=_PREC)
    detR = jnp.linalg.det(R)
    # enforce det +1 by flipping the last column of U
    U_fix = U.at[..., :, 2].multiply(jnp.sign(detR)[..., None])
    R = jnp.matmul(U_fix, Vt, precision=_PREC)
    return jnp.concatenate([R, G[..., 3:4]], axis=-1), degenerate


def pnp_planar(Xw: jnp.ndarray, xn: jnp.ndarray, weights=None):
    """Homography-based PnP for (near-)coplanar samples.

    The 12-parameter DLT above is rank-deficient when the world points
    are coplanar (its null space gains extra dimensions), so planar
    scenes — roads, walls, the reference's own synthetic planes — need
    the homography route (what cv::solvePnP does for planar input, and
    what ASPnP handles internally in the reference's RANSAC driver).

    Plane frame from the sample covariance (closed-form 3x3 eigh), then
    x_n ~ H [q1, q2, 1] with H = [R e1 | R e2 | R Xbar + t]; H from the
    9x9 DLT normal matrix; decomposition orthonormalizes [h1 h2 h1xh2]
    by SVD, with scale = mean singular value of [h1 h2] and sign fixed
    by mean sample depth.
    """
    if weights is None:
        mean = jnp.mean(Xw, axis=-2, keepdims=True)
        C = Xw - mean
        cov = jnp.einsum("...ni,...nj->...ij", C, C, precision=_PREC)
    else:
        w = weights[..., None]
        wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
        mean = jnp.sum(Xw * w, axis=-2, keepdims=True) / wsum
        C = Xw - mean
        cov = jnp.einsum("...ni,...nj->...ij", C * w, C, precision=_PREC)
    _, evecs = jnp.linalg.eigh(cov)  # ascending; normal = evecs[...,0]
    e1 = evecs[..., :, 2]
    e2 = evecs[..., :, 1]
    q1 = jnp.einsum("...ni,...i->...n", C, e1, precision=_PREC)
    q2 = jnp.einsum("...ni,...i->...n", C, e2, precision=_PREC)
    ones = jnp.ones_like(q1)
    qh = jnp.stack([q1, q2, ones], axis=-1)  # (..., n, 3)

    u = xn[..., 0:1]
    v = xn[..., 1:2]
    zero = jnp.zeros_like(qh)
    r1 = jnp.concatenate([qh, zero, -u * qh], axis=-1)  # (..., n, 9)
    r2 = jnp.concatenate([zero, qh, -v * qh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    if weights is not None:
        A = A * jnp.concatenate([weights, weights], axis=-1)[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A, precision=_PREC)
    _, hv = jnp.linalg.eigh(AtA)
    H = hv[..., :, 0].reshape(hv.shape[:-2] + (3, 3))

    h1, h2, h3 = H[..., :, 0], H[..., :, 1], H[..., :, 2]
    scale = 0.5 * (jnp.linalg.norm(h1, axis=-1) + jnp.linalg.norm(h2, axis=-1))
    degenerate = scale < 1e-12
    scale = jnp.where(degenerate, 1.0, scale)
    h1, h2, h3 = h1 / scale[..., None], h2 / scale[..., None], h3 / scale[..., None]
    # chirality: mean depth of (weighted) samples must be positive
    depth = h3[..., 2][..., None] + jnp.einsum(
        "...n,...->...n", q1, h1[..., 2], precision=_PREC
    ) + jnp.einsum("...n,...->...n", q2, h2[..., 2], precision=_PREC)
    if weights is not None:
        flip = jnp.sum(depth * weights, axis=-1) < 0
    else:
        flip = jnp.mean(depth, axis=-1) < 0
    sgn = jnp.where(flip, -1.0, 1.0)[..., None]
    h1, h2, h3 = h1 * sgn, h2 * sgn, h3 * sgn

    # orthonormalize [h1 h2 h1xh2] -> Rp (columns are R e1, R e2, R n)
    h12 = jnp.stack([h1, h2, jnp.cross(h1, h2)], axis=-1)  # (..., 3, 3)
    U, _, Vt = jnp.linalg.svd(h12)
    Rp = jnp.matmul(U, Vt, precision=_PREC)
    detf = jnp.sign(jnp.linalg.det(Rp))
    U_fix = U.at[..., :, 2].multiply(detf[..., None])
    Rp = jnp.matmul(U_fix, Vt, precision=_PREC)

    # R = Rp @ [e1 e2 n]^T;  t = h3 - R mean
    E = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=-1)  # (..., 3, 3)
    R = jnp.matmul(Rp, jnp.swapaxes(E, -1, -2), precision=_PREC)
    t = h3 - jnp.einsum("...ij,...j->...i", R, mean[..., 0, :], precision=_PREC)
    return jnp.concatenate([R, t[..., None]], axis=-1), degenerate


def planarity(Xw: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Ratio of smallest to middle eigenvalue of the sample covariance —
    ~0 for coplanar samples."""
    if weights is None:
        mean = jnp.mean(Xw, axis=-2, keepdims=True)
        C = Xw - mean
        cov = jnp.einsum("...ni,...nj->...ij", C, C, precision=_PREC)
    else:
        w = weights[..., None]
        wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
        mean = jnp.sum(Xw * w, axis=-2, keepdims=True) / wsum
        C = Xw - mean
        cov = jnp.einsum("...ni,...nj->...ij", C * w, C, precision=_PREC)
    evals = jnp.linalg.eigvalsh(cov)
    return evals[..., 0] / jnp.maximum(evals[..., 1], 1e-20)


def pnp_auto(Xw: jnp.ndarray, xn: jnp.ndarray, weights=None,
             planar_thresh: float = 1e-3):
    """Run both solvers, pick per-sample by planarity of the 3D sample."""
    G_g, bad_g = pnp_dlt(Xw, xn, weights=weights)
    G_p, bad_p = pnp_planar(Xw, xn, weights=weights)
    is_planar = planarity(Xw, weights=weights) < planar_thresh
    G = jnp.where(is_planar[..., None, None], G_p, G_g)
    bad = jnp.where(is_planar, bad_p, bad_g)
    return G, bad


def collinearity_degenerate(pts2d: jnp.ndarray, pts3d: jnp.ndarray,
                            eps: float = 2.22e-16) -> jnp.ndarray:
    """True if ANY 3-subset of the sample is collinear in 2D (homog.) or
    3D — the reference's ``degenfn_P``
    (reference: func_ransac_fitcameras_odom.m:175-194).

    pts2d: (..., n, 2); pts3d: (..., n, 3).  n is small (static); all
    C(n,3) triples are checked.
    """
    import itertools

    n = pts2d.shape[-2]
    p2h = jnp.concatenate([pts2d, jnp.ones_like(pts2d[..., :1])], axis=-1)
    bad = jnp.zeros(pts2d.shape[:-2], bool)
    for (i, j, k) in itertools.combinations(range(n), 3):
        c3 = jnp.abs(
            jnp.einsum("...i,...i->...",
                       jnp.cross(pts3d[..., i, :], pts3d[..., j, :]),
                       pts3d[..., k, :], precision=_PREC)
        ) < eps
        c2 = jnp.abs(
            jnp.einsum("...i,...i->...",
                       jnp.cross(p2h[..., i, :], p2h[..., j, :]),
                       p2h[..., k, :], precision=_PREC)
        ) < eps
        bad = bad | c3 | c2
    return bad
