"""Synthetic ground-truth scene generation.

The reference validates its tracker with random clouds + random GT
cameras written through its binary protocol (reference: run_io_test.m:17-57,
run_odometer_test.m:128-146).  Here the same idea is made fully analytic:
a *textured world plane* rendered through exact ray-plane intersection, so
images at any camera pose are generated with zero resampling error and
the photometric-alignment ground truth is exact.

numpy/float64 on purpose — this is test/benchmark fixture code, not a
device path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class PlaneScene(NamedTuple):
    tex_freqs: np.ndarray   # (K, 2) spatial frequencies
    tex_phases: np.ndarray  # (K,)
    tex_amps: np.ndarray    # (K,)
    z0: float               # world plane z = z0
    fc: tuple
    cc: tuple
    wh: tuple


def make_scene(rng: np.random.Generator, wh=(320, 240), fc=(300.0, 310.0),
               cc=None, z0=8.0, num_waves=24, freq_range=(2.0, 20.0)) -> PlaneScene:
    if cc is None:
        cc = (wh[0] / 2.0 + 1.5, wh[1] / 2.0 - 2.0)
    # band-limited texture: default wavelengths ~0.3 to ~3 world units so
    # an 8x8 patch at f~300, z~8 (~0.027 wu/px) sees useful gradients;
    # lower freq_range for workloads with large displacements (stereo)
    freqs = rng.uniform(freq_range[0], freq_range[1], size=(num_waves, 2)) * rng.choice(
        [-1.0, 1.0], size=(num_waves, 2)
    )
    return PlaneScene(
        tex_freqs=freqs,
        tex_phases=rng.uniform(0, 2 * np.pi, size=num_waves),
        tex_amps=rng.uniform(0.3, 1.0, size=num_waves) * (128.0 / num_waves * 3),
        z0=z0,
        fc=fc,
        cc=cc,
        wh=wh,
    )


def texture(scene: PlaneScene, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    acc = np.full(np.broadcast(x, y).shape, 128.0)
    for k in range(scene.tex_freqs.shape[0]):
        acc = acc + scene.tex_amps[k] * np.sin(
            scene.tex_freqs[k, 0] * x + scene.tex_freqs[k, 1] * y + scene.tex_phases[k]
        )
    return acc


def render(scene: PlaneScene, G: np.ndarray) -> np.ndarray:
    """Render the plane through camera [R|t] (world->cam), pinhole.

    Pixel (u, v) casts ray from camera center c = -R^T t with world
    direction R^T [ (u-cx)/fx, (v-cy)/fy, 1 ]; intersect z = z0.
    Returns (H, W) float64 image.
    """
    W, H = scene.wh
    R, t = G[:, :3], G[:, 3]
    c = -R.T @ t
    u, v = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    d_cam = np.stack(
        [(u - scene.cc[0]) / scene.fc[0], (v - scene.cc[1]) / scene.fc[1], np.ones_like(u)],
        axis=-1,
    )
    d_world = d_cam @ R  # = R^T d per pixel
    lam = (scene.z0 - c[2]) / d_world[..., 2]
    wx = c[0] + lam * d_world[..., 0]
    wy = c[1] + lam * d_world[..., 1]
    return texture(scene, wx, wy)


def sample_plane_points(scene: PlaneScene, rng: np.random.Generator, n: int,
                        margin: float = 20.0) -> np.ndarray:
    """n world points on the plane, uniform over the identity-camera
    frustum with a pixel margin."""
    W, H = scene.wh
    u = rng.uniform(margin, W - margin, size=n)
    v = rng.uniform(margin, H - margin, size=n)
    wx = (u - scene.cc[0]) / scene.fc[0] * scene.z0
    wy = (v - scene.cc[1]) / scene.fc[1] * scene.z0
    return np.stack([wx, wy, np.full(n, scene.z0)], axis=1)
