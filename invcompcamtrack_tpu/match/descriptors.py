"""Keypoint descriptors + ratio-test matching.

The reference localizes against an SfM model with vl_sift descriptors
and Lowe ratio matching (reference: run_ransac_test.m:58-77).  The
TPU-native replacement keeps the *capability* (match a query frame's
keypoints against a model's descriptor set) with a batched pipeline:

- Shi-Tomasi corners (match/features.py) for detection,
- a gradient-orientation-histogram patch descriptor ("SIFT-like"):
  4x4 spatial cells x 8 orientation bins over a 16x16 patch, computed
  for ALL keypoints as one tensor program (histograms via soft binning
  = one einsum), L2-normalized with the 0.2 clamp + renormalize,
- brute-force cosine matching on the MXU with Lowe's ratio test
  (the reference's ratio: d1/d2 < thresh, :76).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.image.patch import extract_patches

_PREC = jax.lax.Precision.HIGHEST


def sift_like_descriptors(img_padded: jnp.ndarray, centers: jnp.ndarray,
                          padding: int, patch: int = 16, cells: int = 4,
                          bins: int = 8) -> jnp.ndarray:
    """(N, cells*cells*bins) descriptors at sub-pixel centers.

    img_padded: replicate-padded image (image/pyramid conventions).
    """
    half = patch // 2
    # sample a (patch+2) window so gradients stay inside
    p = extract_patches(img_padded, centers, patch + 2, padding)
    dx = (p[..., 1:-1, 2:] - p[..., 1:-1, :-2]) * 0.5
    dy = (p[..., 2:, 1:-1] - p[..., :-2, 1:-1]) * 0.5
    mag = jnp.sqrt(dx * dx + dy * dy + 1e-12)
    ang = jnp.arctan2(dy, dx)  # [-pi, pi)

    # soft orientation binning
    binpos = (ang + jnp.pi) / (2 * jnp.pi) * bins  # [0, bins)
    b0 = jnp.floor(binpos)
    frac = binpos - b0
    b0 = b0.astype(jnp.int32) % bins
    b1 = (b0 + 1) % bins
    onehot0 = jax.nn.one_hot(b0, bins, dtype=mag.dtype) * (1 - frac)[..., None]
    onehot1 = jax.nn.one_hot(b1, bins, dtype=mag.dtype) * frac[..., None]
    votes = (onehot0 + onehot1) * mag[..., None]  # (N, P, P, bins)

    # gaussian spatial weighting (SIFT-style)
    yy = jnp.arange(patch) - half + 0.5
    g = jnp.exp(-(yy[:, None] ** 2 + yy[None, :] ** 2) / (2 * (half ** 2)))
    votes = votes * g[None, :, :, None]

    # pool into cells x cells spatial histogram
    cs = patch // cells
    N = votes.shape[0]
    votes = votes.reshape(N, cells, cs, cells, cs, bins)
    desc = votes.sum(axis=(2, 4)).reshape(N, cells * cells * bins)

    # normalize, clamp 0.2, renormalize (Lowe)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
    desc = jnp.minimum(desc, 0.2)
    return desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)


def ratio_match(desc_query: jnp.ndarray, desc_model: jnp.ndarray,
                ratio: float = 0.8):
    """Brute-force nearest-neighbor matching with Lowe's ratio test.

    Returns (indices (Nq,), valid (Nq,)): index of the best model match
    per query, valid where d_best/d_second < ratio (L2 on unit vectors).
    One MXU matmul does all pairwise similarities.
    """
    sim = jnp.matmul(desc_query, desc_model.T, precision=_PREC)  # cosine
    # L2^2 on unit vectors = 2 - 2 sim -> ranking by sim descending
    top2, idx2 = jax.lax.top_k(sim, 2)
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[:, 0], 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[:, 1], 1e-12))
    valid = d1 / d2 < ratio
    return idx2[:, 0], valid
