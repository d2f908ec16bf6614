"""Patch resampling from cached local windows.

The solver's query-patch gather dominates its runtime (one Pallas gather
per GN iteration).  Projected positions move less than a few pixels
between iterations of one scale, so instead the solver can gather a
``(WIN, WIN)`` window per point ONCE per scale and resample the
``(psz, psz)`` patch every iteration from the dense window tensor with pure
vector math (select-shift over the few possible integer offsets) — no
gather at all on the iteration path.

The tap construction is IDENTICAL to image/patch.py (same ceil(+1e-5)
bases, same 4 weights), so results are bit-exact as long as the patch
stays inside the window; offsets are clamped otherwise (points drifting
beyond the slack contribute slightly-stale pixels — they are far from
converged anyway, and the next scale re-centers the windows).
"""

from __future__ import annotations

import jax.numpy as jnp


def window_origin(centers: jnp.ndarray, psz: int, win: int, padding: int):
    """Integer (row, col) origin of the cached window for each center,
    chosen so the center's patch sits mid-window.

    Returns origins (..., 2) int32 into the PADDED image.
    """
    slack = (win - psz - 1) // 2
    u0 = jnp.ceil(centers[..., 0] + 1e-5).astype(jnp.int32)
    v0 = jnp.ceil(centers[..., 1] + 1e-5).astype(jnp.int32)
    row0 = v0 - psz // 2 - 1 + padding - slack
    col0 = u0 - psz // 2 - 1 + padding - slack
    return jnp.stack([row0, col0], axis=-1)


def sample_from_windows(windows: jnp.ndarray, origins: jnp.ndarray,
                        centers: jnp.ndarray, psz: int, padding: int,
                        patch_norm: bool = False) -> jnp.ndarray:
    """windows: (..., N, WIN, WIN) cached from the padded image at
    ``origins`` (..., N, 2); centers: (..., N, 2) current sub-pixel
    positions (unpadded coords).  Returns (..., N, psz, psz) patches,
    bit-equal to extract_patches while the patch is inside the window.
    """
    win = windows.shape[-1]
    n_off = win - psz  # possible integer offsets per axis

    u0 = jnp.ceil(centers[..., 0] + 1e-5).astype(jnp.int32)
    v0 = jnp.ceil(centers[..., 1] + 1e-5).astype(jnp.int32)
    rx = (centers[..., 0] - jnp.floor(centers[..., 0])).astype(windows.dtype)
    ry = (centers[..., 1] - jnp.floor(centers[..., 1])).astype(windows.dtype)

    # window-frame integer base of the (psz+1, psz+1) tap support
    row_w = v0 - psz // 2 - 1 + padding - origins[..., 0]
    col_w = u0 - psz // 2 - 1 + padding - origins[..., 1]
    row_w = jnp.clip(row_w, 0, n_off - 1)
    col_w = jnp.clip(col_w, 0, n_off - 1)

    # select-shift: rows first -> (..., N, psz+1, WIN)
    rowsel = jnp.zeros(windows.shape[:-2] + (psz + 1, win), windows.dtype)
    for k in range(n_off):
        m = (row_w == k).astype(windows.dtype)[..., None, None]
        rowsel = rowsel + m * jnp.take(
            windows, jnp.arange(k, k + psz + 1), axis=-2
        )
    # then columns -> (..., N, psz+1, psz+1)
    support = jnp.zeros(windows.shape[:-2] + (psz + 1, psz + 1), windows.dtype)
    for k in range(n_off):
        m = (col_w == k).astype(windows.dtype)[..., None, None]
        support = support + m * jnp.take(
            rowsel, jnp.arange(k, k + psz + 1), axis=-1
        )

    w00 = (rx * ry)[..., None, None]
    w01 = ((1 - rx) * ry)[..., None, None]
    w10 = (rx * (1 - ry))[..., None, None]
    w11 = ((1 - rx) * (1 - ry))[..., None, None]
    patches = (
        w00 * support[..., 1:, 1:] + w01 * support[..., 1:, :-1]
        + w10 * support[..., :-1, 1:] + w11 * support[..., :-1, :-1]
    )
    if patch_norm:
        patches = patches - jnp.mean(patches, axis=(-2, -1), keepdims=True)
    return patches


def gather_windows_any(img: jnp.ndarray, origins: jnp.ndarray, win: int):
    """Backend-dispatching window gather (Pallas on TPU, XLA otherwise).
    img: PADDED image; origins: (..., 2) int32 into it."""
    from invcompcamtrack_tpu.ops.patch_pallas import pallas_available

    if pallas_available(img.dtype):
        from invcompcamtrack_tpu.ops.patch_pallas import gather_windows

        return gather_windows(img, origins, win, win)
    import jax

    H, W = img.shape
    flat = origins.reshape(-1, 2)
    r0 = jnp.clip(flat[:, 0], 0, H - 1)
    c0 = jnp.clip(flat[:, 1], 0, W - 1)

    def one(r, c):
        return jax.lax.dynamic_slice(img, (r, c), (win, win))

    out = jax.vmap(one)(r0, c0)
    return out.reshape(origins.shape[:-1] + (win, win))
