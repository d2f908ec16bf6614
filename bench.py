"""Headline benchmark: batched IC-GN pose tracking throughput on one chip.

Workload: the reference's canonical single-pair configuration —
100 tracked points, psz=8, 5 pyramid levels (lv_f=4 -> lv_l=0),
maxiter=10 (reference: run_odometer_test.m:232) — batched over B
independent pose-tracking problems sharing one 1280x720 image pair
(the RANSAC-verification shape, reference: run_track_nposes.cpp:193).

Baseline: the reference's own in-source timing table for exactly this
configuration on one x86 core (odometer.cpp:156-167):
  per scale:  26.141 + 8.562 + 16.097            = 50.80 us
  per iter:   0.237 + 19.9 + 4.00 + 0.323 + 0.064 = 24.52 us
  setup:      0.067 + 0.482                       =  0.55 us
  total/pair: 0.55 + 5*50.80 + 50*24.52           ~ 1480 us
  -> 676 tracked pairs/s/core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# persistent compile cache: the remote-compile path is slow, and the
# bench program is large — cache hits cut minutes off repeated runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp

BASELINE_PAIRS_PER_S = 676.0


def main():
    from invcompcamtrack_tpu.config import ICGNParams
    from invcompcamtrack_tpu.core import lie
    from invcompcamtrack_tpu.core.camera import CameraPyramid
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.solver.icgn import track_pose_batch
    from invcompcamtrack_tpu.vo import synthetic

    B, N = 256, 100
    cfg = ICGNParams(lv_f=4, lv_l=0, psz=8, maxiter=10, normdp_ratio=0.01,
                     donorm=True, dopatchnorm=False)

    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(rng, wh=(1280, 720), fc=(1000.0, 1200.0), z0=8.0)

    def exp_np(p):
        return np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)), np.float64)

    p_gt = np.r_[rng.normal(size=3) * 0.02, rng.normal(size=3) * 0.01]
    img_ref = synthetic.render(scene, exp_np(np.zeros(6)))
    img_new = synthetic.render(scene, exp_np(p_gt))

    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, cfg.num_levels, cfg.psz)
    pyr_ref = build_pyramid(jnp.asarray(img_ref, jnp.float32), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new, jnp.float32), cfg.num_levels, cfg.psz)

    X = jnp.asarray(
        np.stack([synthetic.sample_plane_points(scene, rng, N) for _ in range(B)]),
        jnp.float32,
    )
    p0 = jnp.zeros((B, 6), jnp.float32)

    step = jax.jit(lambda a, b, Xa, pa: track_pose_batch(a, b, Xa, pa, cam, cfg))
    out = step(pyr_ref, pyr_new, X, p0)
    out.block_until_ready()  # compile

    # correctness guard: the timed program must actually solve the
    # problem (finite poses converging to the GT camera center)
    G = np.asarray(lie.se3_exp(jnp.asarray(out)))
    centers = -np.einsum("bji,bj->bi", G[:, :, :3], G[:, :, 3])
    G_gt = np.asarray(lie.se3_exp(jnp.asarray(p_gt, jnp.float32)))
    c_gt = -G_gt[:, :3].T @ G_gt[:, 3]
    err = np.linalg.norm(centers - c_gt, axis=1)
    assert np.all(np.isfinite(err)), "bench produced non-finite poses"
    assert np.median(err) < 0.05, f"bench pose error too large: {np.median(err)}"

    # steady-state timing
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(pyr_ref, pyr_new, X, p0)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pairs_per_s = B * reps / dt
    result = {
        "metric": "icgn_pose_tracks_per_sec",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s/chip (100pts psz8 lv4-0 maxiter10)",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
