"""Shi-Tomasi corner detection (goodFeaturesToTrack equivalent).

Replaces the reference's ``cv2.goodFeaturesToTrack(gray, 1000, 0.001, 5)``
corner seeding (reference: run_OF_point_track.py.ipynb cell 2) with a
conv/pool formulation that maps cleanly onto the TPU:

- structure tensor from central-difference gradients, box-filtered,
- corner response = min eigenvalue of the 2x2 tensor (closed form),
- non-max suppression via max-pooling with the given radius,
- top-K selection (fixed K, masked) by response threshold relative to
  the global maximum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.image.pyramid import central_gradients


def _box_filter(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    kernel = jnp.ones((k, k), x.dtype) / (k * k)
    return jax.lax.conv_general_dilated(
        x[None, None], kernel[None, None], (1, 1), "SAME",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def _maxpool_same(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )


def shi_tomasi_response(img: jnp.ndarray, window_radius: int = 1) -> jnp.ndarray:
    """Min-eigenvalue corner response map, same shape as img."""
    dx, dy = central_gradients(img)
    ixx = _box_filter(dx * dx, window_radius)
    ixy = _box_filter(dx * dy, window_radius)
    iyy = _box_filter(dy * dy, window_radius)
    tr = 0.5 * (ixx + iyy)
    det_part = jnp.sqrt(jnp.maximum(0.25 * (ixx - iyy) ** 2 + ixy * ixy, 0.0))
    return tr - det_part  # smaller eigenvalue


def shi_tomasi_corners(img: jnp.ndarray, max_corners: int = 1000,
                       quality_level: float = 0.001, min_distance: int = 5,
                       border: int = 8):
    """Top-K corners with NMS.

    Returns (xy (K, 2) float, valid (K,)) — fixed K with a validity mask
    (the TPU-shaped version of a variable-length corner list).
    """
    H, W = img.shape
    resp = shi_tomasi_response(img)
    # suppress borders
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    resp = jnp.where(inside, resp, -jnp.inf)
    # non-max suppression
    is_peak = resp >= _maxpool_same(resp, min_distance)
    thresh = quality_level * jnp.max(resp)
    score = jnp.where(is_peak & (resp >= thresh), resp, -jnp.inf)

    # Selection.  A flat top-k over H*W pixels is sort-shaped and slow on
    # TPU (tens of ms at 720p), so for large images we bucket the score
    # map into a grid of tiles and take each tile's argmax, then top-k
    # over the (few thousand) tile winners.  This caps corners at one
    # per tile — which for tracking seeds is a feature, not a loss: it
    # enforces the spatial spread that goodFeaturesToTrack's min_distance
    # only approximates.  Small images keep the exact flat top-k.
    if H * W > 64 * max_corners:
        tile = max(8, int(round((H * W / (4.0 * max_corners)) ** 0.5)))
        Hp = -(-H // tile) * tile
        Wp = -(-W // tile) * tile
        padded = jnp.full((Hp, Wp), -jnp.inf, score.dtype).at[:H, :W].set(score)
        tiles = padded.reshape(Hp // tile, tile, Wp // tile, tile)
        tiles = tiles.transpose(0, 2, 1, 3).reshape(-1, tile * tile)
        t_val = jnp.max(tiles, axis=1)
        t_arg = jnp.argmax(tiles, axis=1)
        n_tiles = t_val.shape[0]
        ty, tx = jnp.divmod(jnp.arange(n_tiles), Wp // tile)
        py, px = jnp.divmod(t_arg, tile)
        flat_idx = (ty * tile + py) * W + (tx * tile + px)
        k = min(max_corners, n_tiles)
        vals, sel = jax.lax.top_k(t_val, k)
        idx = jnp.take(flat_idx, sel)
        if k < max_corners:
            pad = max_corners - k
            vals = jnp.concatenate([vals, jnp.full((pad,), -jnp.inf, vals.dtype)])
            idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    else:
        flat = score.reshape(-1)
        vals, idx = jax.lax.top_k(flat, max_corners)
    xy = jnp.stack([(idx % W).astype(img.dtype), (idx // W).astype(img.dtype)], axis=1)
    valid = jnp.isfinite(vals)
    return xy, valid
