"""Example: DIS-vs-NCC-vs-MOSSE style patch-matching evaluation (the
reference's correlation lab, reference: run_OF_NCC_eval.py /
run_OF_NCC_VOT_test.py): track points between two frames with
(a) pyramidal LK, (b) FFT-NCC peak search, (c) MOSSE peak search,
and report magnitude-binned endpoint errors against analytic GT.

Usage: python examples/run_ncc_eval.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.image.patch import extract_patches
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match import ncc
from invcompcamtrack_tpu.match.lk import track_points_lk
from invcompcamtrack_tpu.vo import synthetic


def main():
    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(rng, wh=(320, 240), fc=(300.0, 302.0))
    p_gt = np.r_[rng.normal(size=3) * 0.015, rng.normal(size=3) * 0.006]
    exp = lambda p: np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)), np.float64)
    img_a = synthetic.render(scene, exp(np.zeros(6)))
    img_b = synthetic.render(scene, exp(p_gt))

    X = synthetic.sample_plane_points(scene, rng, 150, margin=40)
    G = exp(p_gt)
    Xc = X @ G[:, :3].T + G[:, 3]
    uv_a = np.stack([
        X[:, 0] / X[:, 2] * scene.fc[0] + scene.cc[0],
        X[:, 1] / X[:, 2] * scene.fc[1] + scene.cc[1]], 1)
    uv_b = np.stack([
        Xc[:, 0] / Xc[:, 2] * scene.fc[0] + scene.cc[0],
        Xc[:, 1] / Xc[:, 2] * scene.fc[1] + scene.cc[1]], 1)

    L, pad, P = 3, 16, 32
    pa = build_pyramid(jnp.asarray(img_a, jnp.float32), L, pad)
    pb = build_pyramid(jnp.asarray(img_b, jnp.float32), L, pad)

    def epe(est, label):
        err = np.linalg.norm(np.asarray(est) - uv_b, axis=1)
        print(f"{label:8s} EPE mean {err.mean():6.3f}  median {np.median(err):6.3f}"
              f"  p95 {np.percentile(err, 95):6.3f}")

    # (a) pyramidal LK
    lk, ok = track_points_lk(pa, pb, jnp.asarray(uv_a, jnp.float32),
                             psz=8, padding=pad)
    epe(lk, "LK")

    # (b) FFT-NCC: search the PxP correlation surface around each point
    ca = jnp.asarray(uv_a, jnp.float32)
    t = extract_patches(pa[0].img, ca, P, pad, patch_norm=True)
    q = extract_patches(pb[0].img, ca, P, pad, patch_norm=True)
    surf = ncc.ncc_surface_fft(t[:, None], q[:, None])
    off, _ = ncc.peak_subpixel(surf)
    epe(ca + off, "FFT-NCC")

    # (c) MOSSE
    h = ncc.mosse_filter(t[:, None], gsigma=2.0, beta=0.1)
    resp = ncc.mosse_response(h, q[:, None])
    off_m, _ = ncc.peak_subpixel(resp)  # MOSSE response is already center-anchored
    epe(ca + off_m, "MOSSE")


if __name__ == "__main__":
    sys.exit(main())
