"""Patch correlation: direct NCC, FFT NCC surfaces, MOSSE filters.

Behavioral specs:

- unit-norm NCC with a 1e-15 norm floor and zero clamp
  (reference: func_OF_util.py:115-122, run_track_nposes.cpp:317-324),
- the forward/backward track-quality score weighting correlations by the
  squared frame counts (reference: run_track_nposes.cpp:281-352),
- FFT correlation surface ``fftshift(Re ifft2(Fq conj(Ft)))`` clamped at
  zero and averaged over channels (reference: run_OF_NCC_VOT_test.py:63-74),
- MOSSE: ``H* = G conj(F) / (F conj(F) + beta)``
  (reference: run_OF_NCC_VOT_test.py:108-135, Bolme et al. CVPR 2010),
- cosine window + 2D gaussian helpers (reference: func_OF_util.py:169-187).

Everything is batched over leading dims; FFTs run on the TPU via XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

NORM_FLOOR = 1e-15


def _unit(p):
    flat = p.reshape(p.shape[:-2] + (-1,))
    norm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
    return flat / jnp.maximum(norm, NORM_FLOOR)


def ncc_score(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """max(0, <a/|a|, b/|b|>) over the last two (patch) dims."""
    return jnp.maximum(0.0, jnp.sum(_unit(a) * _unit(b), axis=-1))


def patch_correlation_score(patch_back, patch_ref, patch_fwd,
                            valid_back, valid_ref, valid_fwd,
                            fb_frames) -> jnp.ndarray:
    """Forward/backward odometry-verification score per point
    (reference: run_track_nposes.cpp:281-352).

    corr = max(0, (corr_br * fb0^2 + corr_rf * fb1^2) / (fb0^2 + fb1^2))
    with weights zeroed for invalid back/fwd patches, and -1 when the
    reference patch itself is invalid.
    """
    corr_br = ncc_score(patch_back, patch_ref)
    corr_rf = ncc_score(patch_ref, patch_fwd)
    return patch_correlation_combine(corr_br, corr_rf, valid_back,
                                     valid_ref, valid_fwd, fb_frames)


def patch_correlation_combine(corr_br, corr_rf, valid_back, valid_ref,
                              valid_fwd, fb_frames) -> jnp.ndarray:
    """fb^2-weighted combination of precomputed pair correlations — the
    tail of ``patch_correlation_score``, shared with the fused Pallas
    scorer (ops/ncc_pallas.py)."""
    fb0, fb1 = fb_frames
    w0 = jnp.where(valid_back, float(fb0 * fb0), 0.0)
    w1 = jnp.where(valid_fwd, float(fb1 * fb1), 0.0)
    denom = jnp.maximum(w0 + w1, NORM_FLOOR)
    corr = jnp.maximum(0.0, (corr_br * w0 + corr_rf * w1) / denom)
    return jnp.where(valid_ref, corr, -1.0)


def ncc_surface_fft(template: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Dense correlation surface between same-size patches.

    template/query: (..., C, P, P) -> (..., P, P);
    = mean_C max(0, fftshift(Re ifft2(Fq conj(Ft)))).
    """
    ft = jnp.fft.fft2(template)
    fq = jnp.fft.fft2(query)
    res = jnp.fft.ifft2(fq * jnp.conj(ft))
    res = jnp.maximum(0.0, jnp.real(jnp.fft.fftshift(res, axes=(-2, -1))))
    return jnp.mean(res, axis=-3)


def gauss2d(psz: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 2D gaussian (reference: func_OF_util.py:177-187)."""
    m = jnp.ceil((psz - 1) / 2.0)
    y = jnp.arange(psz, dtype=dtype) - m
    h = jnp.exp(-(y[:, None] ** 2 + y[None, :] ** 2) / (2.0 * sigma * sigma))
    h = jnp.where(h < jnp.finfo(dtype).eps * h.max(), 0.0, h)
    return h / jnp.sum(h)


def cosine_window(psz: int, dtype=jnp.float32) -> jnp.ndarray:
    """Radial cosine taper (reference: func_OF_util.py:169-175)."""
    cent = psz // 2
    xi = jnp.arange(psz, dtype=dtype)
    r = jnp.sqrt(
        ((xi[:, None] - cent + 0.5) ** 2 + (xi[None, :] - cent + 0.5) ** 2)
        / float(cent * cent)
    )
    return jnp.cos(jnp.minimum(1.0, r) * jnp.pi / 2.0)


def mosse_filter(template: jnp.ndarray, gsigma: float, beta: float = 0.1) -> jnp.ndarray:
    """Learn a MOSSE filter in the Fourier domain from one (or a batch of)
    template patch(es): H* = G conj(F) / (F conj(F) + beta)
    (reference: run_OF_NCC_VOT_test.py:112-120).  Returns complex (..., P, P).
    """
    psz = template.shape[-1]
    g_fft = jnp.fft.fft2(gauss2d(psz, gsigma).astype(template.dtype))
    f = jnp.fft.fft2(template)
    return (g_fft * jnp.conj(f)) / (f * jnp.conj(f) + beta)


def mosse_response(h_fft: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Apply a learned MOSSE filter: mean_C max(0, Re ifft2(Fq H)).
    query: (..., C, P, P); h_fft: (..., C, P, P)."""
    fq = jnp.fft.fft2(query)
    res = jnp.maximum(0.0, jnp.real(jnp.fft.ifft2(fq * h_fft)))
    return jnp.mean(res, axis=-3)


def peak_subpixel(surface: jnp.ndarray):
    """argmax of a correlation surface with quadratic sub-pixel fit.

    surface: (..., P, P) -> (offset_xy (..., 2), peak value (...,)).
    Offsets are relative to the surface center (fftshift convention).
    """
    P = surface.shape[-1]
    flat = surface.reshape(surface.shape[:-2] + (-1,))
    idx = jnp.argmax(flat, axis=-1)
    py, px = idx // P, idx % P
    val = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]

    def grab(dy, dx):
        yy = jnp.clip(py + dy, 0, P - 1)
        xx = jnp.clip(px + dx, 0, P - 1)
        return jnp.take_along_axis(flat, (yy * P + xx)[..., None], axis=-1)[..., 0]

    # 1D parabola fits in x and y
    cx0, cx2 = grab(0, -1), grab(0, 1)
    cy0, cy2 = grab(-1, 0), grab(1, 0)
    denx = cx0 - 2 * val + cx2
    deny = cy0 - 2 * val + cy2
    dx = jnp.where(jnp.abs(denx) > 1e-12, 0.5 * (cx0 - cx2) / denx, 0.0)
    dy = jnp.where(jnp.abs(deny) > 1e-12, 0.5 * (cy0 - cy2) / deny, 0.0)
    off = jnp.stack([px + dx - P // 2, py + dy - P // 2], axis=-1)
    return off, val
