"""Float64 numpy oracles for the image layer: straightforward, slow
implementations of bilinear sampling, pooling and gradients, written from
the spec (not from the reference's pointer walk)."""

import numpy as np


def bilinear_sample(img, x, y):
    """Standard bilinear sample of unpadded img at float (x, y)."""
    x0 = int(np.floor(x))
    y0 = int(np.floor(y))
    fx = x - x0
    fy = y - y0
    H, W = img.shape

    def px(yy, xx):
        return img[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)]

    return (
        (1 - fx) * (1 - fy) * px(y0, x0)
        + fx * (1 - fy) * px(y0, x0 + 1)
        + (1 - fx) * fy * px(y0 + 1, x0)
        + fx * fy * px(y0 + 1, x0 + 1)
    )


def extract_patch(img, cx, cy, psz, patch_norm=False):
    """Patch = bilinear samples at (cx, cy) + offset - psz/2, offsets in
    [0, psz)^2 — the geometric meaning of the reference gather."""
    out = np.zeros((psz, psz))
    for dy in range(psz):
        for dx in range(psz):
            out[dy, dx] = bilinear_sample(img, cx + dx - psz // 2, cy + dy - psz // 2)
    if patch_norm:
        out = out - out.mean()
    return out


def downsample2x(img):
    H, W = img.shape
    img = img[: H - H % 2, : W - W % 2]
    return img.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))


def central_gradients(img):
    dx = np.zeros_like(img)
    dy = np.zeros_like(img)
    dx[:, 1:-1] = img[:, 2:] - img[:, :-2]
    # reflect-101 border: I[-1] == I[1], I[W] == I[W-2]
    dx[:, 0] = img[:, 1] - img[:, 1]
    dx[:, -1] = img[:, -2] - img[:, -2]
    dy[1:-1, :] = img[2:, :] - img[:-2, :]
    dy[0, :] = 0.0
    dy[-1, :] = 0.0
    return dx, dy
