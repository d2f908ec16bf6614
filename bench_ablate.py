"""Solver cost ablation on the real TPU: split per-call time into
per-scale fixed costs vs per-iteration costs, and sweep the hypothesis
batch B — the measurement base for kernel work (docs/kernels.md).

Methodology: one warm jitted call per configuration, timed blocked over
R reps.  Per-scale fixed cost ~= time(maxiter=1) - iter_cost; iter cost
per GN iteration ~= (time(maxiter=10) - time(maxiter=1)) / 9 / levels
(upper bound — convergence masking makes late iterations cheaper).

Usage: python benchmarks/ablate_solver.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import time

import numpy as np

import jax

from invcompcamtrack_tpu.utils import jaxcache

jaxcache.enable()
import jax.numpy as jnp

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.solver.icgn import track_pose_batch
from invcompcamtrack_tpu.vo import synthetic


def setup(B, N=100):
    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(rng, wh=(1280, 720), fc=(1000.0, 1200.0),
                                 z0=8.0)

    def exp_np(p):
        return np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)), np.float64)

    p_gt = np.r_[rng.normal(size=3) * 0.02, rng.normal(size=3) * 0.01]
    img_ref = synthetic.render(scene, exp_np(np.zeros(6)))
    img_new = synthetic.render(scene, exp_np(p_gt))
    X = jnp.asarray(
        np.stack([synthetic.sample_plane_points(scene, rng, N)
                  for _ in range(B)]), jnp.float32)
    p0 = jnp.zeros((B, 6), jnp.float32)
    return scene, img_ref, img_new, X, p0


def timed(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def run_cfg(scene, img_ref, img_new, X, p0, **kw):
    cfg = ICGNParams(lv_f=kw.pop("lv_f", 4), lv_l=kw.pop("lv_l", 0), psz=8,
                     normdp_ratio=kw.pop("normdp_ratio", 0.01),
                     donorm=True, dopatchnorm=False, **kw)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               cfg.num_levels, cfg.psz)
    pyr_ref = build_pyramid(jnp.asarray(img_ref, jnp.float32),
                            cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new, jnp.float32),
                            cfg.num_levels, cfg.psz)
    fn = jax.jit(lambda Xa, pa: track_pose_batch(pyr_ref, pyr_new, Xa, pa,
                                                 cam, cfg))
    return timed(fn, X, p0)


def main():
    print("backend:", jax.default_backend())
    B = 256
    scene, img_ref, img_new, X, p0 = setup(B)

    t10 = run_cfg(scene, img_ref, img_new, X, p0, maxiter=10)
    t1 = run_cfg(scene, img_ref, img_new, X, p0, maxiter=1,
                 normdp_ratio=1e-12)
    # normdp_ratio tiny => no early exit; isolates true per-iter cost
    t10f = run_cfg(scene, img_ref, img_new, X, p0, maxiter=10,
                   normdp_ratio=1e-12)
    print(f"B={B}: maxiter10 {t10*1e3:.1f} ms ({B/t10:.0f} pairs/s); "
          f"maxiter1 {t1*1e3:.1f} ms; maxiter10-noexit {t10f*1e3:.1f} ms")
    print(f"  per-scale fixed ~= {t1*1e3/5:.2f} ms/scale; "
          f"per-iter ~= {(t10f-t1)*1e3/45:.2f} ms/iter (5 scales)")

    # single-scale splits: which level dominates
    for lv in [4, 2, 0]:
        t = run_cfg(scene, img_ref, img_new, X, p0, maxiter=10,
                    lv_f=lv, lv_l=lv, normdp_ratio=1e-12)
        t1s = run_cfg(scene, img_ref, img_new, X, p0, maxiter=1,
                      lv_f=lv, lv_l=lv, normdp_ratio=1e-12)
        print(f"  level {lv} only: fixed {t1s*1e3:.2f} ms, "
              f"iter {(t-t1s)*1e3/9:.3f} ms/iter")

    # batch sweep (amortization of B-independent costs)
    for Bs in [64, 256, 512, 1024]:
        _, _, _, Xs, ps = setup(Bs)
        t = run_cfg(scene, img_ref, img_new, Xs, ps, maxiter=10)
        print(f"  B={Bs}: {t*1e3:.1f} ms -> {Bs/t:.0f} pairs/s")


if __name__ == "__main__":
    main()
