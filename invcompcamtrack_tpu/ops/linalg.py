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

import jax.numpy as jnp


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
