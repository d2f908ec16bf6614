"""Multi-scale pinhole camera model + lens distortion.

Spec from the reference's ``CamClass`` (reference: camera.cpp:32-43):
per-level intrinsics scale by ``2^-i``; ``swo/sho`` are the *unpadded*
float image sizes at each level and ``sw/sh`` add ``2*padding``.  The
pyramid is assumed to be an exact x0.5 chain (reference: camera.h:12-13).

Here the per-level values live in small ``(L,)`` arrays inside a pytree
NamedTuple so the camera can be traced, vmapped over (multi-camera rigs)
or treated as static constants — indexing by level is always static.

Distortion follows the polynomial radial+tangential model of the
reference's python layer (reference: misc_src/func_util_geom.py:447-515).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CameraPyramid(NamedTuple):
    """Per-level pinhole intrinsics; every field has shape (..., L)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    swo: jnp.ndarray  # unpadded width  at level (float, = 2^-i * W)
    sho: jnp.ndarray  # unpadded height at level
    padding: int      # static pixel padding added around every level

    @classmethod
    def create(cls, fc, cc, wh, num_levels: int, padding: int) -> "CameraPyramid":
        """fc=(fx,fy), cc=(cx,cy), wh=(W,H) at full resolution."""
        scale = 0.5 ** jnp.arange(num_levels, dtype=jnp.float32)
        return cls(
            fx=jnp.asarray(fc[0], jnp.float32) * scale,
            fy=jnp.asarray(fc[1], jnp.float32) * scale,
            cx=jnp.asarray(cc[0], jnp.float32) * scale,
            cy=jnp.asarray(cc[1], jnp.float32) * scale,
            swo=jnp.asarray(wh[0], jnp.float32) * scale,
            sho=jnp.asarray(wh[1], jnp.float32) * scale,
            padding=int(padding),
        )

    @property
    def num_levels(self) -> int:
        return self.fx.shape[-1]

    def level(self, s: int):
        """Static-level accessor -> (fx, fy, cx, cy, swo, sho) scalars."""
        return (
            self.fx[..., s],
            self.fy[..., s],
            self.cx[..., s],
            self.cy[..., s],
            self.swo[..., s],
            self.sho[..., s],
        )

    def intrinsic_matrix(self, s: int = 0) -> jnp.ndarray:
        K = jnp.eye(3, dtype=self.fx.dtype)
        K = K.at[0, 0].set(self.fx[..., s])
        K = K.at[1, 1].set(self.fy[..., s])
        K = K.at[0, 2].set(self.cx[..., s])
        K = K.at[1, 2].set(self.cy[..., s])
        return K


def distort(pt_n: jnp.ndarray, kc: jnp.ndarray) -> jnp.ndarray:
    """Apply radial+tangential distortion in normalized image coords.

    pt_n: (..., 2); kc: (K,) with K in {0,1,2,4,5} following the reference
    layout [k1, k2, p1, p2, k3] (reference: func_util_geom.py:447-480).
    """
    nk = int(kc.shape[0])
    if nk == 0:
        return pt_n
    x, y = pt_n[..., 0], pt_n[..., 1]
    r2 = x * x + y * y
    rc = 1.0 + kc[0] * r2
    if nk > 1:
        rc = rc + kc[1] * r2 * r2
        if nk == 5:
            rc = rc + kc[4] * r2 * r2 * r2
    out = pt_n * rc[..., None]
    if nk >= 3:
        dx = 2.0 * kc[2] * x * y + kc[3] * (r2 + 2.0 * x * x)
        dy = 2.0 * kc[3] * x * y + kc[2] * (r2 + 2.0 * y * y)
        out = out + jnp.stack([dx, dy], axis=-1)
    return out


def undistort(pt_n: jnp.ndarray, kc: jnp.ndarray) -> jnp.ndarray:
    """One-step inverse distortion (the reference's single-pass
    approximation, not an iterative inverse; reference:
    func_util_geom.py:483-515): subtract tangential term computed at the
    distorted point, divide by radial factor."""
    nk = int(kc.shape[0])
    if nk == 0:
        return pt_n
    x, y = pt_n[..., 0], pt_n[..., 1]
    r2 = x * x + y * y
    rc = 1.0 + kc[0] * r2
    out = pt_n
    if nk > 1:
        rc = rc + kc[1] * r2 * r2
        if nk == 5:
            rc = rc + kc[4] * r2 * r2 * r2
        if nk >= 3:
            dx = 2.0 * kc[2] * x * y + kc[3] * (r2 + 2.0 * x * x)
            dy = 2.0 * kc[3] * x * y + kc[2] * (r2 + 2.0 * y * y)
            out = out - jnp.stack([dx, dy], axis=-1)
    return out / rc[..., None]
