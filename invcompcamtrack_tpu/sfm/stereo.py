"""Rectified-stereo utilities.

The reference's stereo/KITTI chain triangulates from disparity and
gates tracks by 4-way left/right forward/backward consistency
(reference: run_test_OF_track.py:189-220, 360-371).
"""

from __future__ import annotations

import jax.numpy as jnp


def disparity_to_points(uv_left: jnp.ndarray, disparity: jnp.ndarray,
                        fx, fy, cx, cy, baseline) -> jnp.ndarray:
    """Rectified-pair triangulation: Z = fx * B / d, X = (u - cx) Z / fx,
    Y = (v - cy) Z / fy (left-camera frame).  Non-positive disparities
    give NaN (behind / at infinity).
    """
    d = jnp.where(disparity > 0, disparity, jnp.nan)
    Z = fx * baseline / d
    X = (uv_left[..., 0] - cx) * Z / fx
    Y = (uv_left[..., 1] - cy) * Z / fy
    return jnp.stack([X, Y, Z], axis=-1)


def stereo_flow_consistency(uv_l0, uv_r0, uv_l1, uv_r1,
                            max_vertical: float = 1.5,
                            max_loop: float = 1.5):
    """4-way consistency over a stereo pair tracked one step:
    rectification (same row in L/R) at both times plus closed-loop
    displacement agreement (reference: run_test_OF_track.py:189-220).
    Inputs are matched point sets (N, 2).  Returns a validity mask."""
    rect0 = jnp.abs(uv_l0[..., 1] - uv_r0[..., 1]) < max_vertical
    rect1 = jnp.abs(uv_l1[..., 1] - uv_r1[..., 1]) < max_vertical
    loop = jnp.linalg.norm(
        (uv_l1 - uv_l0) - (uv_r1 - uv_r0), axis=-1
    ) < max_loop
    finite = (
        jnp.all(jnp.isfinite(uv_l0), -1) & jnp.all(jnp.isfinite(uv_r0), -1)
        & jnp.all(jnp.isfinite(uv_l1), -1) & jnp.all(jnp.isfinite(uv_r1), -1)
    )
    return rect0 & rect1 & loop & finite
