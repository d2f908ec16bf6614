"""Horizon-based camera-orientation estimation.

Port of the reference's horizon-alignment experiment
(reference: misc_src/run_orientation_extraction_test.ipynb cells 1-8):
a world great circle (the horizon — the plane orthogonal to the up
vector) is projected through a candidate rotation; pixel strips sampled
orthogonally across the projected line should show maximal
above-vs-below contrast when the rotation is right.

The reference optimizes a quaternion with scipy's simplex over a numpy
loss; here the loss is a differentiable JAX program (reusing the bilinear
sampling machinery), optimized by a few damped Gauss-ish gradient steps
on the so(3) tangent — or by any external optimizer via ``horizon_loss``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie

_PREC = jax.lax.Precision.HIGHEST


def _circle_points(n: int = 64) -> jnp.ndarray:
    """Unit great circle in the horizon plane (up = +y; reference cell 1)."""
    t = jnp.arange(n) * (2.0 * jnp.pi / n)
    return jnp.stack([jnp.sin(t), jnp.zeros_like(t), jnp.cos(t)], axis=1)


def _bilinear(img, pts):
    H, W = img.shape
    x = jnp.clip(pts[:, 0], 0.0, W - 2.0)
    y = jnp.clip(pts[:, 1], 0.0, H - 2.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)

    def tap(yy, xx):
        return jnp.take(flat, yy * W + xx)

    return ((1 - fx) * (1 - fy) * tap(y0, x0) + fx * (1 - fy) * tap(y0, x0 + 1)
            + (1 - fx) * fy * tap(y0 + 1, x0) + fx * fy * tap(y0 + 1, x0 + 1))


def horizon_loss(w: jnp.ndarray, img: jnp.ndarray, fc, cc,
                 n_circle: int = 64, n_strip: int = 8,
                 strip_scale: float | None = None) -> jnp.ndarray:
    """Negative above/below contrast across the projected horizon.

    w: (3,) so(3) tangent (rotation = exp(w)); img: (H, W) grayscale.
    Lower is better.  Invisible / behind-camera points are masked.
    """
    H, W = img.shape
    fc = jnp.asarray(fc)
    cc = jnp.asarray(cc)
    if strip_scale is None:
        strip_scale = float(np.sqrt(H * W) / 10.0)

    R = lie.so3_exp(w)
    C = _circle_points(n_circle)
    Xc = jnp.einsum("ij,nj->ni", R, C, precision=_PREC)
    # in front of the camera (reference keeps sum(circlept * R[2]) > 0)
    front = Xc[:, 2] > 1e-3
    z = jnp.where(front, Xc[:, 2], 1.0)
    uv = Xc[:, :2] / z[:, None] * fc + cc
    visible = front & (uv[:, 0] > 0) & (uv[:, 0] < W) & (uv[:, 1] > 0) & (uv[:, 1] < H)

    # local tangent of the projected circle -> orthogonal strip direction
    nxt = jnp.roll(uv, -1, axis=0)
    prv = jnp.roll(uv, 1, axis=0)
    tang = nxt - prv
    tang = tang / jnp.maximum(jnp.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    ortho = jnp.stack([tang[:, 1], -tang[:, 0]], axis=1)

    dist = jnp.linspace(1.0, strip_scale, n_strip)
    up = uv[:, None, :] + ortho[:, None, :] * dist[None, :, None]
    dn = uv[:, None, :] - ortho[:, None, :] * dist[None, :, None]
    v_up = _bilinear(img, up.reshape(-1, 2)).reshape(n_circle, n_strip)
    v_dn = _bilinear(img, dn.reshape(-1, 2)).reshape(n_circle, n_strip)

    contrast = jnp.abs(jnp.mean(v_up, axis=1) - jnp.mean(v_dn, axis=1))
    m = visible.astype(img.dtype)
    return -jnp.sum(contrast * m) / jnp.maximum(jnp.sum(m), 1.0)


def estimate_orientation(img: jnp.ndarray, fc, cc, w0=None,
                         num_iters: int = 100, lr: float = 2e-3):
    """Gradient-descent refinement of the camera orientation from the
    horizon.  Returns (w (3,), loss) — R = so3_exp(w)."""
    img = jnp.asarray(img)
    if w0 is None:
        w0 = jnp.zeros(3, img.dtype)
    loss_grad = jax.value_and_grad(lambda w: horizon_loss(w, img, fc, cc))

    def step(carry, _):
        w, _ = carry
        val, g = loss_grad(w)
        gn = jnp.linalg.norm(g)
        g = jnp.where(gn > 1.0, g / gn, g)  # clip
        return (w - lr * g, val), None

    (w, val), _ = jax.lax.scan(step, (w0, jnp.asarray(0.0, img.dtype)), None,
                               length=num_iters)
    return w, horizon_loss(w, img, fc, cc)
