"""Two-view relative-pose initialization (essential-matrix bootstrap).

The reference never self-initializes — its drivers read SfM models or
synthetic GT for the starting pose/cloud (reference: run_odometer_test.m
:21-39, run_io_test.m).  A standalone VO engine needs to boot from two
frames alone, so this module provides the standard essential-matrix
pipeline, batched in the framework's style:

- corners + forward/backward LK matches,
- E from the normalized 8-point solver on calibrated coords (the
  fundamental machinery of sfm/epipolar.py reused; for calibrated
  points F == E up to scale), RANSAC over hypothesis batch,
- closed-form decomposition E -> {R1, R2} x {+-t} with the cheirality
  test over triangulated depths choosing among the 4 candidates,
- DLT + GN triangulation of the surviving matches as landmark seeds.

Monocular scale is free; ``t`` is unit-norm (callers fix scale by any
external cue or leave trajectories scale-ambiguous like all mono VO).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core.pose import projection_matrix
from invcompcamtrack_tpu.sfm.epipolar import fundamental_8pt, sampson_distance
from invcompcamtrack_tpu.sfm.triangulate import triangulate_dlt, triangulate_gn

_PREC = jax.lax.Precision.HIGHEST


class TwoViewInit(NamedTuple):
    pose1: jnp.ndarray      # (6,) se(3) of frame 1 (frame 0 = identity)
    landmarks: jnp.ndarray  # (N, 3) triangulated seeds (NaN where invalid)
    valid: jnp.ndarray      # (N,) bool
    num_inliers: jnp.ndarray


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate [R|t] (world->cam of view 1, view 0 = identity)."""
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    Vt = Vt * jnp.where(d < 0, -1.0, 1.0)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    R1 = jnp.matmul(U, jnp.matmul(W, Vt, precision=_PREC), precision=_PREC)
    R2 = jnp.matmul(U, jnp.matmul(W.T, Vt, precision=_PREC), precision=_PREC)
    t = U[:, 2]
    Gs = []
    for R in (R1, R2):
        for s in (1.0, -1.0):
            Gs.append(jnp.concatenate([R, (s * t)[:, None]], axis=1))
    return jnp.stack(Gs)  # (4, 3, 4)


def initialize_two_view(key, xn0: jnp.ndarray, xn1: jnp.ndarray,
                        match_valid: jnp.ndarray, n_samples: int = 256,
                        thresh: float = 2e-4) -> TwoViewInit:
    """Bootstrap from matched NORMALIZED image points (K removed).

    xn0/xn1: (N, 2); match_valid: (N,).  thresh is a Sampson threshold in
    normalized coords (~ (px / f)^2 scale).
    """
    N = xn0.shape[0]
    keys = jax.random.split(key, n_samples)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(8,), replace=False)
    )(keys)
    Es = fundamental_8pt(jnp.take(xn0, idx, axis=0), jnp.take(xn1, idx, axis=0))
    d = sampson_distance(
        Es, jnp.broadcast_to(xn0, (n_samples,) + xn0.shape),
        jnp.broadcast_to(xn1, (n_samples,) + xn1.shape),
    )
    inl = (d <= thresh) & match_valid
    cnt = jnp.sum(inl, axis=-1)
    best = jnp.argmax(cnt)
    inliers = inl[best]
    # least-squares refit of E on the winning inlier set
    E = fundamental_8pt(xn0, xn1, weights=inliers.astype(xn0.dtype))

    # 4-way decomposition; pick by cheirality over triangulated depths
    cands = decompose_essential(E)
    fc = jnp.asarray([1.0, 1.0])
    cc = jnp.asarray([0.0, 0.0])
    eye = jnp.concatenate([jnp.eye(3, dtype=E.dtype),
                           jnp.zeros((3, 1), E.dtype)], axis=1)

    def score_and_points(G):
        c1 = lie.camera_center(G)
        P0 = projection_matrix(fc, cc, eye[:, :3], jnp.zeros(3, E.dtype))
        P1 = projection_matrix(fc, cc, G[:, :3], c1)
        P = jnp.broadcast_to(jnp.stack([P0, P1]), (N, 2, 3, 4))
        obs = jnp.stack([xn0, xn1], axis=1)
        X, _ = triangulate_dlt(P, obs)
        X = jnp.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
        X, _ = triangulate_gn(P, obs, X, num_iters=3)
        z0 = X[:, 2]
        z1 = (jnp.einsum("ij,nj->ni", G[:, :3], X, precision=_PREC) + G[:, 3])[:, 2]
        good = (z0 > 1e-6) & (z1 > 1e-6) & inliers & jnp.all(jnp.isfinite(X), 1)
        return jnp.sum(good), X, good

    scores, Xs, goods = jax.vmap(score_and_points)(cands)
    pick = jnp.argmax(scores)
    G = cands[pick]
    X = Xs[pick]
    good = goods[pick]
    return TwoViewInit(
        pose1=lie.se3_log(G),
        landmarks=jnp.where(good[:, None], X, jnp.nan),
        valid=good,
        num_inliers=cnt[best],
    )
