"""SE(3)/SO(3) Lie-group maps as batched, differentiable jnp programs.

Behavioral spec comes from the reference's closed-form templates
(reference: utilities.h:84-241, "Lie Groups for Computer Vision", Eade):

- coefficient order is ``p = [t_x, t_y, t_z, w_x, w_y, w_z]``,
- the group element is a row-major ``3x4`` matrix ``[R | t]`` acting as
  ``x_cam = R @ X + t``,
- exp uses a Taylor fallback for small rotation angle with threshold
  ``SIG_THRESH = 1e-4`` (reference: utilities.h:22),
- log uses ``theta = acos((tr R - 1)/2)``, zero-rotation guard
  ``EPSILON = 1e-10`` (reference: utilities.h:23) and the closed-form
  ``V^{-1}``.

Unlike the reference (scalar templated C++), everything here is
shape-polymorphic over leading batch dimensions and safe under ``vmap`` /
``grad`` (NaN-free ``where`` guards on both branches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small 3x3/3x4 products must not be demoted to bf16 on the TPU MXU —
# geometry requires full f32. All matmuls here request HIGHEST precision.
_PREC = jax.lax.Precision.HIGHEST

SIG_THRESH = 1e-4   # small-angle switch (reference: utilities.h:22)
EPSILON = 1e-10     # zero-rotation guard (reference: utilities.h:23)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix; w: (..., 3) -> (..., 3, 3)."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def _exp_coeffs(sig_sq: jnp.ndarray):
    """(sa, sb, sc) = (sin s/s, (1-cos s)/s^2, (s-sin s)/s^3) with the
    reference's nested-Horner Taylor fallback (reference: utilities.h:99-110).

    The small-angle predicate is evaluated on sig^2 (sqrt of 0 has an
    infinite derivative; guarding *inside* the sqrt keeps grads finite).
    """
    small = sig_sq <= SIG_THRESH * SIG_THRESH
    sig_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(sig_sq), sig_sq))
    sa_exact = jnp.sin(sig_safe) / sig_safe
    sb_exact = (1.0 - jnp.cos(sig_safe)) / (sig_safe * sig_safe)
    sc_exact = (sig_safe - jnp.sin(sig_safe)) / (sig_safe**3)
    sa_tay = 1.0 - sig_sq / 6.0 * (1.0 - sig_sq / 20.0 * (1.0 - sig_sq / 42.0))
    sb_tay = 0.5 * (1.0 - sig_sq / 12.0 * (1.0 - sig_sq / 30.0 * (1.0 - sig_sq / 56.0)))
    sc_tay = (1.0 - sig_sq / 20.0 * (1.0 - sig_sq / 42.0 * (1.0 - sig_sq / 72.0))) / 6.0
    sa = jnp.where(small, sa_tay, sa_exact)
    sb = jnp.where(small, sb_tay, sb_exact)
    sc = jnp.where(small, sc_tay, sc_exact)
    return sa, sb, sc


def se3_exp(p: jnp.ndarray) -> jnp.ndarray:
    """se(3) coefficients -> group element.

    p: (..., 6) as [t(3), w(3)]  ->  G: (..., 3, 4) = [R | V t].

    Closed form ``R = I + sa [w]_x + sb [w]_x^2`` and
    ``V = I + sb [w]_x + sc [w]_x^2`` (reference: utilities.h:84-145).
    """
    t, w = p[..., 0:3], p[..., 3:6]
    sig_sq = jnp.sum(w * w, axis=-1)
    sa, sb, sc = _exp_coeffs(sig_sq)

    wx = skew(w)
    wx2 = jnp.matmul(wx, wx, precision=_PREC)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), wx.shape)
    R = eye + sa[..., None, None] * wx + sb[..., None, None] * wx2
    V = eye + sb[..., None, None] * wx + sc[..., None, None] * wx2
    Vt = jnp.einsum("...ij,...j->...i", V, t, precision=_PREC)
    return jnp.concatenate([R, Vt[..., None]], axis=-1)


def se3_log(G: jnp.ndarray) -> jnp.ndarray:
    """Group element -> se(3) coefficients.

    G: (..., 3, 4) = [R | t]  ->  p: (..., 6) = [V^{-1} t, w].

    Matches the reference's convention exactly: ``theta = acos((tr-1)/2)``,
    ``[w]_x = theta/(2 sin theta) (R - R^T)`` with a hard zero below
    ``EPSILON``, and ``V^{-1} = I - [w]_x/2 + h [w]_x^2`` where ``h = 1/12``
    for ``theta < SIG_THRESH`` else ``(1 - theta/(2 tan(theta/2)))/theta^2``
    (reference: utilities.h:149-241).
    """
    R = G[..., :3]
    t = G[..., 3]
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_th = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_th)

    tiny = theta < EPSILON
    theta_safe = jnp.where(tiny, jnp.ones_like(theta), theta)
    coef = theta_safe / (2.0 * jnp.sin(theta_safe))
    coef = jnp.where(tiny, jnp.zeros_like(coef), coef)

    wx = coef[..., None, None] * (R - jnp.swapaxes(R, -1, -2))
    w = jnp.stack([-wx[..., 1, 2], wx[..., 0, 2], -wx[..., 0, 1]], axis=-1)
    wx2 = jnp.matmul(wx, wx, precision=_PREC)

    small = theta < SIG_THRESH
    th_safe = jnp.where(small, jnp.ones_like(theta), theta)
    h_exact = (1.0 - th_safe / (2.0 * jnp.tan(th_safe / 2.0))) / (th_safe * th_safe)
    h = jnp.where(small, jnp.full_like(theta, 1.0 / 12.0), h_exact)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=G.dtype), wx.shape)
    V_inv = eye - 0.5 * wx + h[..., None, None] * wx2
    u = jnp.einsum("...ij,...j->...i", V_inv, t, precision=_PREC)
    return jnp.concatenate([u, w], axis=-1)


def se3_matrix(G: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> homogeneous (..., 4, 4)."""
    bottom = jnp.zeros(G.shape[:-2] + (1, 4), dtype=G.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([G, bottom], axis=-2)


def se3_inverse(G: jnp.ndarray) -> jnp.ndarray:
    """[R|t] -> [R^T | -R^T t]."""
    R = G[..., :3]
    t = G[..., 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate(
        [Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_PREC)[..., None]], axis=-1
    )


def se3_compose(Ga: jnp.ndarray, Gb: jnp.ndarray) -> jnp.ndarray:
    """Group composition: (Ga . Gb) with x -> Ra(Rb x + tb) + ta."""
    Ra, ta = Ga[..., :3], Ga[..., 3]
    Rb, tb = Gb[..., :3], Gb[..., 3]
    R = jnp.matmul(Ra, Rb, precision=_PREC)
    t = jnp.einsum("...ij,...j->...i", Ra, tb, precision=_PREC) + ta
    return jnp.concatenate([R, t[..., None]], axis=-1)


def camera_center(G: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center c = -R^T t of [R|t]."""
    R = G[..., :3]
    t = G[..., 3]
    return -jnp.einsum("...ji,...j->...i", R, t, precision=_PREC)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3) rotation."""
    p = jnp.concatenate([jnp.zeros_like(w), w], axis=-1)
    return se3_exp(p)[..., :3]


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation -> axis-angle vector (..., 3)."""
    G = jnp.concatenate([R, jnp.zeros_like(R[..., :1])], axis=-1)
    return se3_log(G)[..., 3:6]
