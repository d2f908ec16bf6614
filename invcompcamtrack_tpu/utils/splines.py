"""Smoothing splines + integration utilities.

Reference semantics preserved exactly:

- ``smoothing_spline`` is the Reinsch-form natural-cubic smoother with
  the reference's (unconventional) smoother matrix
  ``LL = (I + (1/p) K - K)^{-1}`` (reference: func_util_geom.py:293-327),
- the batched variant stitches overlapping blocks with floor/ceil
  half-overlap boundaries (reference: :189-222),
- cross-validated smoothing-parameter search: a breadth-``treespread``
  grid refined ``depthiter`` times around the argmin of a Monte-Carlo
  leave-out residual (reference: :225-290),
- spline double integration for accelerometer -> displacement
  (reference: run_csv_parse.py:181-188) via scipy's antiderivatives.
"""

from __future__ import annotations

import numpy as np
from scipy import interpolate as scpint


def smoothing_spline(x: np.ndarray, y: np.ndarray, p: float):
    """x: (n,) strictly increasing; y: (n, d).  Returns (yhat, LL, p)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = x.shape[0]
    hi = np.diff(x)
    delta = np.zeros((n - 2, n))
    for i in range(n - 2):
        delta[i, i] = 1.0 / hi[i]
        delta[i, i + 1] = -1.0 / hi[i] - 1.0 / hi[i + 1]
        delta[i, i + 2] = 1.0 / hi[i + 1]
    W = np.zeros((n - 2, n - 2))
    for i in range(n - 2):
        W[i, i] = (hi[i] + hi[i + 1]) / 3.0
        if i > 0:
            W[i - 1, i] = hi[i] / 6.0
            W[i, i - 1] = hi[i] / 6.0
    K = delta.T @ np.linalg.inv(W) @ delta
    LL = np.linalg.inv(np.eye(n) + (1.0 / p) * K - K)
    return LL @ y, LL, p


def smoothing_spline_batch(x, y, p, batchsize: int = 2000, overlap: float = 0.49):
    """Block-wise smoothing with overlap stitching
    (reference: func_util_geom.py:189-222)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = x.shape[0]
    batchsize = min(batchsize, n)
    noverlap = int(batchsize * overlap)
    startpos = np.arange(0, n - noverlap, batchsize - noverlap)
    endpos = np.minimum(startpos + batchsize, n)
    nblocks = startpos.shape[0]
    lb = int(np.floor(noverlap / 2.0))
    ub = int(np.ceil(noverlap / 2.0))
    out = np.zeros_like(y)
    for nb in range(nblocks):
        yhat, _, p = smoothing_spline(x[startpos[nb]:endpos[nb]],
                                      y[startpos[nb]:endpos[nb]], p)
        if nb == 0:
            out[: endpos[nb] - ub] = yhat[: batchsize - ub]
        if nb == nblocks - 1:
            out[startpos[nb] + lb:] = yhat[lb:]
        if 0 < nb < nblocks - 1:
            out[startpos[nb] + lb: endpos[nb] - ub] = yhat[lb: batchsize - ub]
    return out


def smoothing_spline_crossval_p(x, y, crossval_frac: float = 0.1,
                                rounds: int = 50, depth_iters: int = 4,
                                tree_spread: int = 5,
                                rng: np.random.Generator | None = None) -> float:
    """Monte-Carlo cross-validated choice of the smoothing parameter
    (reference: func_util_geom.py:225-290; round counts default smaller
    here — the reference used 1000x10, configurable)."""
    rng = rng or np.random.default_rng(0)
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = y.shape[0]
    nremove = max(1, int(np.ceil(n * crossval_frac)))

    def residual(p):
        acc = []
        for _ in range(rounds):
            idx = rng.choice(n, nremove, replace=False)
            keep = np.setdiff1d(np.arange(n), idx)
            yhat, _, _ = smoothing_spline(x[keep], y[keep], p)
            interp = np.stack(
                [np.interp(x[idx], x[keep], yhat[:, k]) for k in range(y.shape[1])],
                axis=1,
            )
            acc.append(np.mean(np.linalg.norm(interp - y[idx], axis=1) ** 2))
        return float(np.mean(acc))

    parr = np.linspace(1e-10, 1.0, tree_spread)
    resp = np.array([residual(p) for p in parr])
    imin = int(np.argmin(resp))
    best = parr[imin]
    for _ in range(depth_iters):
        lo = parr[max(0, imin - 1)]
        hi = parr[min(tree_spread - 1, imin + 1)]
        parr = np.linspace(lo, hi, tree_spread)
        resp = np.array([residual(p) for p in parr])
        imin = int(np.argmin(resp))
        best = parr[imin]
    return float(best)


def double_integrate(t: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Acceleration (T, d) -> displacement (T, d) via exact cubic-spline
    double antiderivatives (reference: run_csv_parse.py:181-188)."""
    t = np.asarray(t, float)
    a = np.asarray(a, float)
    out = np.zeros_like(a)
    for k in range(a.shape[1]):
        tck = scpint.splrep(t, a[:, k], s=0.0)
        tck2 = scpint.splantider(tck, 2)
        out[:, k] = scpint.splev(t, tck2)
    return out
