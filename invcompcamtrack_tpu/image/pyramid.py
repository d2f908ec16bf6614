"""Image pyramid + gradient construction.

Behavioral spec (reference: utilities.cpp:14-52):

- level 0 is the input image; level i+1 is a x0.5 bilinear resize of
  level i.  For even dimensions OpenCV's INTER_LINEAR x0.5 is exactly a
  2x2 box average, which is what we implement (as an average-pool
  reshape, which XLA fuses well).  Odd trailing rows/cols are dropped
  (the reference assumes divisibility by 2: camera.h:12-13).
- per level, gradients dx/dy are 3-tap central differences
  ``[-1, 0, 1]`` (cv::Sobel with ksize=1, no scaling) with reflect-101
  borders (cv::BORDER_DEFAULT).
- every level is padded by ``padding`` pixels: images replicate the
  border, gradients pad with zeros (reference: utilities.cpp:38-51).

A pyramid is a tuple of per-level ``PyramidLevel`` NamedTuples — a pytree,
so it passes transparently through jit/vmap/scan boundaries.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class PyramidLevel(NamedTuple):
    img: jnp.ndarray  # (H + 2p, W + 2p) padded image
    dx: jnp.ndarray   # same shape, zero-padded gradient
    dy: jnp.ndarray


Pyramid = Tuple[PyramidLevel, ...]


def downsample2x(img: jnp.ndarray) -> jnp.ndarray:
    """Exact x0.5 bilinear downsample = 2x2 average pool (even dims;
    odd trailing row/col dropped)."""
    H, W = img.shape[-2], img.shape[-1]
    img = img[..., : H - H % 2, : W - W % 2]
    H2, W2 = img.shape[-2] // 2, img.shape[-1] // 2
    return img.reshape(img.shape[:-2] + (H2, 2, W2, 2)).mean(axis=(-3, -1))


def central_gradients(img: jnp.ndarray):
    """dx[i,j] = I[i,j+1] - I[i,j-1] (and dy vertically) with reflect-101
    borders — cv::Sobel(ksize=1) semantics, no 1/2 scaling."""
    px = jnp.pad(img, [(0, 0)] * (img.ndim - 1) + [(1, 1)], mode="reflect")
    dx = px[..., 2:] - px[..., :-2]
    py = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(1, 1), (0, 0)], mode="reflect")
    dy = py[..., 2:, :] - py[..., :-2, :]
    return dx, dy


def pad_level(img: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray, padding: int):
    pad = [(0, 0)] * (img.ndim - 2) + [(padding, padding), (padding, padding)]
    return PyramidLevel(
        img=jnp.pad(img, pad, mode="edge"),
        dx=jnp.pad(dx, pad, mode="constant"),
        dy=jnp.pad(dy, pad, mode="constant"),
    )


def build_pyramid(img: jnp.ndarray, num_levels: int, padding: int,
                  with_grad: bool = True) -> Pyramid:
    """img: (..., H, W) float -> tuple of `num_levels` padded levels.

    ``padding`` is the patch size in the reference call sites
    (reference: run_io_reprojection_test.cpp:157-158, imgpadding = psz).
    """
    levels = []
    cur = img
    for i in range(num_levels):
        if i > 0:
            cur = downsample2x(cur)
        if with_grad:
            dx, dy = central_gradients(cur)
        else:
            dx = jnp.zeros_like(cur)
            dy = jnp.zeros_like(cur)
        levels.append(pad_level(cur, dx, dy, padding))
    return tuple(levels)
