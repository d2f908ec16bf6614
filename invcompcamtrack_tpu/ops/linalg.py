"""Small-matrix linear algebra, unrolled for the VPU.

XLA's batched ``jnp.linalg.solve`` lowers 6x6 LU to pivoting loops that
cost ~1.8 us/solve on TPU (measured, bench_kernels.py) — worse than the
reference's single-core Eigen.  The GN normal matrix is symmetric
positive (semi-)definite, so an unrolled Cholesky solves it in straight
vector code that batches perfectly.  The reference itself recorded llt
as its fastest variant (reference: odometer.cpp:511-514) but shipped
fullPivLu for robustness; robustness here comes from a scaled diagonal
jitter on non-finite/non-positive pivots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

# 3x3 contractions must not demote to bf16 on the MXU: the truncated
# pseudo-inverse's accuracy claim (f32 matches the f64 oracle) is the
# whole point of the closed-form path.
_PREC = jax.lax.Precision.HIGHEST


def cholesky_solve_sym(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for symmetric positive (semi-)definite H.

    H: (..., n, n); b: (..., n) with small static n (unrolled).
    Near-singular pivots are guarded (clamped), which acts like a tiny
    Tikhonov regularizer instead of producing inf/NaN.
    """
    n = H.shape[-1]
    eps = jnp.asarray(1e-30, H.dtype)

    # Jacobi preconditioning: the GN normal matrix mixes translation and
    # rotation units (and the reference's normalize-by-varval scaling can
    # skew them by orders of magnitude when the cloud statistics include
    # far-outside points), so equilibrate columns by 1/sqrt(diag) first.
    # Exact arithmetic is unchanged; in f32 it recovers the ~4 digits the
    # raw factorization loses at diagonal imbalance ~1e8.
    d = jnp.sqrt(jnp.maximum(
        jnp.abs(jnp.diagonal(H, axis1=-2, axis2=-1)), eps))
    H = H / (d[..., :, None] * d[..., None, :])
    b = b / d

    # Cholesky: H = L L^T, unrolled
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                s = jnp.maximum(s, eps)
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]

    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]

    # back substitution: L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]

    return jnp.stack(x, axis=-1) / d


# ---------------------------------------------------------------------------
# Closed-form symmetric 3x3 eigendecomposition
#
# The BA landmark blocks H_ll are (L, 3, 3) symmetric PSD systems whose
# spectral truncation gates depth updates (ba/window.py).  Batched
# ``jnp.linalg.eigh`` on TPU lowers to an iterative Jacobi sweep whose
# f32 noise on near-singular blocks (lambda_min/lambda_max ~ 1e-6) is
# amplified by 1/lambda in the pseudo-inverse and was measured to poison
# whole-window accept/reject (docs/parity.md deviation #8).  The
# reference handles its own 3x3 landmark systems in closed form
# (reference: misc_src/triang.c:135-148 — a cofactor inverse); this is
# the eigen-analogue: the trigonometric (Cardano) characteristic-root
# solution plus cross-product eigenvectors, fully branch-free (where()
# selects) so it batches on the VPU with zero iteration noise.


def _cross(a, b):
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
    ], axis=-1)


def _unit(v, eps):
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, eps), n[..., 0]


def _eigvec_from_rows(A, lam, eps):
    """Eigenvector of symmetric A for eigenvalue lam via the largest
    cross product of rows of (A - lam I) — exact when lam is a simple
    root; the largest-norm selection keeps it stable as rows become
    parallel."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01, c12, c20 = _cross(r0, r1), _cross(r1, r2), _cross(r2, r0)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    n20 = jnp.sum(c20 * c20, axis=-1)
    best = jnp.where(
        (n01 >= n12)[..., None] & (n01 >= n20)[..., None], c01,
        jnp.where((n12 >= n20)[..., None], c12, c20))
    v, n = _unit(best, eps)
    # all rows parallel (double root) -> any unit vector orthogonal to
    # the rows works; fall back to the largest row's orthogonal
    rn0 = jnp.sum(r0 * r0, axis=-1)
    rn1 = jnp.sum(r1 * r1, axis=-1)
    rn2 = jnp.sum(r2 * r2, axis=-1)
    row = jnp.where((rn0 >= rn1)[..., None] & (rn0 >= rn2)[..., None], r0,
                    jnp.where((rn1 >= rn2)[..., None], r1, r2))
    ex = jnp.zeros_like(row).at[..., 0].set(1.0)
    ey = jnp.zeros_like(row).at[..., 1].set(1.0)
    o1 = _cross(row, ex)
    o2 = _cross(row, ey)
    o = jnp.where((jnp.sum(o1 * o1, axis=-1)
                   >= jnp.sum(o2 * o2, axis=-1))[..., None], o1, o2)
    o, _ = _unit(o, eps)
    # triple root (M ~ 0): identity basis vector
    o = jnp.where((jnp.maximum(jnp.maximum(rn0, rn1), rn2)
                   > eps * eps)[..., None], o, ex)
    return jnp.where((n > eps)[..., None], v, o)


def _eigvec_mid(A, v0, lam1, eps):
    """Middle eigenvector: null vector of the 2x2 restriction of
    (A - lam1 I) to the plane orthogonal to v0 (Eberly's construction —
    exact orthogonality to v0 by construction, cluster-safe)."""
    # orthonormal basis (U, W) of the plane orthogonal to v0
    ex = jnp.zeros_like(v0).at[..., 0].set(1.0)
    ey = jnp.zeros_like(v0).at[..., 1].set(1.0)
    seed = jnp.where((jnp.abs(v0[..., 0]) > 0.9)[..., None], ey, ex)
    U, _ = _unit(_cross(v0, seed), eps)
    W = _cross(v0, U)
    AU = jnp.einsum("...ij,...j->...i", A, U, precision=_PREC) - lam1[..., None] * U
    AW = jnp.einsum("...ij,...j->...i", A, W, precision=_PREC) - lam1[..., None] * W
    m00 = jnp.sum(U * AU, axis=-1)
    m01 = jnp.sum(U * AW, axis=-1)
    m11 = jnp.sum(W * AW, axis=-1)
    # null vector of [[m00, m01], [m01, m11]]: use the better-scaled row
    use0 = jnp.abs(m00) >= jnp.abs(m11)
    a = jnp.where(use0, m01, m11)
    b = jnp.where(use0, -m00, -m01)
    s = jnp.sqrt(a * a + b * b)
    ok = s > eps
    a = jnp.where(ok, a / jnp.maximum(s, eps), 1.0)
    b = jnp.where(ok, b / jnp.maximum(s, eps), 0.0)
    return a[..., None] * U + b[..., None] * W


def sym3x3_eigh(A: jnp.ndarray):
    """Batched closed-form eigendecomposition of symmetric 3x3 matrices.

    Returns ``(lam, V)`` with eigenvalues ascending along the last axis
    and eigenvectors in the COLUMNS of V (``A ~= V @ diag(lam) @ V.T``),
    matching ``jnp.linalg.eigh``'s convention.  Branch-free Cardano
    roots + cross-product vectors; f32-stable on near-singular PSD
    blocks where the iterative eigh is not (see module docstring).
    """
    dtype = A.dtype
    eps = jnp.asarray(np.finfo(np.dtype(dtype)).tiny ** 0.5, dtype)
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    # scale to unit max-abs so the cubic's intermediates stay in range
    scale = jnp.max(jnp.abs(A), axis=(-2, -1))
    s = jnp.maximum(scale, eps)
    An = A / s[..., None, None]

    q = jnp.trace(An, axis1=-2, axis2=-1) / 3.0
    B = An - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    Bn = B / jnp.maximum(p, eps)[..., None, None]
    # det(Bn)/2 with Bn symmetric
    b00, b01, b02 = Bn[..., 0, 0], Bn[..., 0, 1], Bn[..., 0, 2]
    b11, b12, b22 = Bn[..., 1, 1], Bn[..., 1, 2], Bn[..., 2, 2]
    half_det = 0.5 * (b00 * (b11 * b22 - b12 * b12)
                      - b01 * (b01 * b22 - b12 * b02)
                      + b02 * (b01 * b12 - b11 * b02))
    half_det = jnp.clip(half_det, -1.0, 1.0)
    phi = jnp.arccos(half_det) / 3.0
    two_pi_3 = jnp.asarray(2.0943951023931953, dtype)
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam_mid = 3.0 * q - lam_hi - lam_lo

    # first eigenvector from the better-separated extreme root
    # (half_det >= 0 -> the largest root is the isolated one)
    hi_first = half_det >= 0
    lam_a = jnp.where(hi_first, lam_hi, lam_lo)
    lam_b = jnp.where(hi_first, lam_lo, lam_hi)
    v_a = _eigvec_from_rows(An, lam_a, eps)
    v_mid = _eigvec_mid(An, v_a, lam_mid, eps)
    v_b = _cross(v_a, v_mid)
    # degenerate scale (A ~ 0 or isotropic): identity basis
    iso = p <= eps * jnp.maximum(jnp.abs(q), 1.0)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), An.shape)
    cols_hi = jnp.where(iso[..., None], I3[..., 2],
                        jnp.where(hi_first[..., None], v_a, v_b))
    cols_mid = jnp.where(iso[..., None], I3[..., 1], v_mid)
    cols_lo = jnp.where(iso[..., None], I3[..., 0],
                        jnp.where(hi_first[..., None], v_b, v_a))
    lam = jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1) * s[..., None]
    V = jnp.stack([cols_lo, cols_mid, cols_hi], axis=-1)
    return lam, V


def sym3x3_trunc_pinv(A: jnp.ndarray, rel_floor: float | jnp.ndarray):
    """Spectral-truncated pseudo-inverse of symmetric PSD 3x3 blocks.

    Eigen-directions with eigenvalue below ``rel_floor * lambda_max``
    contribute ZERO (treated as unobserved) — the BA landmark-block
    observability cutoff (ba/window.py), computed through the
    closed-form ``sym3x3_eigh`` so f32 TPU results match the f64 CPU
    oracle to roundoff instead of Jacobi-iteration noise.
    """
    lam, V = sym3x3_eigh(A)
    lam_max = lam[..., 2:3]
    inv_l = jnp.where(lam > rel_floor * lam_max,
                      1.0 / jnp.maximum(lam, jnp.asarray(1e-30, A.dtype)),
                      0.0)
    return jnp.einsum("...ij,...j,...kj->...ik", V, inv_l, V,
                      precision=_PREC)
