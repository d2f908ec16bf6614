"""Dense pyramidal Lucas-Kanade optical flow.

Self-contained replacement for the external OF_DIS binary the reference
shells out to for dense flow (reference: run_OF_point_track.py.ipynb
cell 2, run_Oflow_*.py; SURVEY.md §7 item 5).  Classic coarse-to-fine
dense LK with window sums as box-filter convolutions:

per level (coarse -> fine):
  flow = 2x upsampled coarser flow
  iterate:
    I1w = warp(I1, flow)                      (dense bilinear gather)
    It  = I1w - I0;  (Ix, Iy) = grad I0
    A = box([Ix^2, IxIy, Iy^2]); b = box([Ix It, Iy It])
    flow -= A^{-1} b   (closed-form 2x2, det-guarded)

Everything is dense tensor work except the warp's bilinear gather; a
Pallas dense-warp kernel is the known follow-up for TPU speed-of-light
(the flow itself is smooth, so the gather has high locality).

Outputs interoperate with the flow-transfer track table
(match/track.py) and the .flo IO + EPE evaluation + color-wheel viz.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.image.pyramid import Pyramid, central_gradients


def warp_image(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp: out(x) = img(x + flow(x)), bilinear, edge-clamped.

    img: (H, W); flow: (H, W, 2) in (dx, dy) order.
    """
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype),
                          jnp.arange(W, dtype=flow.dtype), indexing="ij")
    sx = xx + flow[..., 0]
    sy = yy + flow[..., 1]
    x0 = jnp.clip(jnp.floor(sx), 0, W - 2)
    y0 = jnp.clip(jnp.floor(sy), 0, H - 2)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(-1)

    def tap(yi, xi):
        return jnp.take(flat, yi * W + xi, axis=0)

    return (
        (1 - fx) * (1 - fy) * tap(y0i, x0i)
        + fx * (1 - fy) * tap(y0i, x0i + 1)
        + (1 - fx) * fy * tap(y0i + 1, x0i)
        + fx * fy * tap(y0i + 1, x0i + 1)
    )


def _box(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    kernel = jnp.ones((k, k), x.dtype)
    return jax.lax.conv_general_dilated(
        x[None, None], kernel[None, None], (1, 1), "SAME",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def _warp_dispatch(img, flow):
    from invcompcamtrack_tpu.ops.patch_pallas import pallas_available

    if pallas_available(img.dtype):
        from invcompcamtrack_tpu.ops.warp_pallas import warp_image_pallas

        return warp_image_pallas(img, flow)
    return warp_image(img, flow)


def _lk_refine(I0, I1, flow, iters: int, radius: int, min_det: float):
    Ix, Iy = central_gradients(I0)
    Ix = Ix * 0.5  # central_gradients returns unscaled I[x+1]-I[x-1]
    Iy = Iy * 0.5
    a11 = _box(Ix * Ix, radius)
    a12 = _box(Ix * Iy, radius)
    a22 = _box(Iy * Iy, radius)
    det = a11 * a22 - a12 * a12
    good = det > min_det
    det_safe = jnp.where(good, det, 1.0)

    def body(_, flow):
        It = _warp_dispatch(I1, flow) - I0
        b1 = _box(Ix * It, radius)
        b2 = _box(Iy * It, radius)
        du = (a22 * b1 - a12 * b2) / det_safe
        dv = (a11 * b2 - a12 * b1) / det_safe
        upd = jnp.stack([du, dv], axis=-1)
        upd = jnp.where(good[..., None], upd, 0.0)
        return flow - upd

    return jax.lax.fori_loop(0, iters, body, flow)


def global_shift(I0: jnp.ndarray, I1: jnp.ndarray) -> jnp.ndarray:
    """Dominant integer translation I0 -> I1 via FFT cross-correlation
    (the coarse initializer role DIS fills with its coarsest grid
    search): peak of ifft(F1 conj(F0)) at d means I1(x) ~ I0(x - d)."""
    w0 = I0 - I0.mean()
    w1 = I1 - I1.mean()
    xc = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(w1) * jnp.conj(jnp.fft.fft2(w0))))
    xc = jnp.fft.fftshift(xc)
    H, W = I0.shape
    idx = jnp.argmax(xc)
    dy = (idx // W) - H // 2
    dx = (idx % W) - W // 2
    return jnp.stack([dx, dy]).astype(I0.dtype)


def dense_flow_lk(pyr0: Pyramid, pyr1: Pyramid, padding: int,
                  iters: int = 3, radius: int = 4,
                  min_det: float = 1e-4, global_init: bool = True) -> jnp.ndarray:
    """Dense flow from image 0 to image 1.

    pyr0/pyr1: pyramids from image.pyramid.build_pyramid (their padding
    is stripped here).  Returns (H, W, 2) at full resolution.

    ``global_init`` seeds the coarsest level with the FFT-correlation
    dominant translation — extends the usable range far beyond the
    pyramid's LK basin for large mostly-translational motion.
    """
    L = len(pyr0)
    flow = None
    for s in range(L - 1, -1, -1):
        I0 = pyr0[s].img[padding:-padding, padding:-padding]
        I1 = pyr1[s].img[padding:-padding, padding:-padding]
        H, W = I0.shape
        if flow is None:
            init = global_shift(I0, I1) if global_init \
                else jnp.zeros((2,), I0.dtype)
            flow = jnp.broadcast_to(init, (H, W, 2)).astype(I0.dtype)
        else:
            flow = 2.0 * jax.image.resize(flow, (H, W, 2), "bilinear")
        flow = _lk_refine(I0, I1, flow, iters, radius, min_det)
    return flow
