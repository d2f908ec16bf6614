"""Per-kernel microbenchmarks — the reference's in-source timing table
(reference: odometer.cpp:156-167, utilities.h:75-85, pose.h:35-36;
reproduced in BASELINE.md) re-measured for the TPU implementations.

Reference numbers are per 100 points/patches on one x86 core; TPU
numbers are reported both at the same batch (latency-bound) and at a
chip-filling batch (throughput), because a TPU at batch 100 measures
dispatch latency, not the kernel.

Usage: python bench_kernels.py   (prints a table + one JSON line)
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def bench_collective_latency():
    """Measured bounds for the analytic ICI model (parallel/model.py).

    Multi-chip hardware is unreachable here, so this measures what one
    chip CAN measure:

    - ``psum_dispatch_us``: round-trip of a jitted shard_map program
      whose body is one psum over a 1-device mesh — a lower bound on
      the per-collective dispatch+launch latency term,
    - ``hbm_reduce_gbps``: bandwidth of a 64 MB on-chip reduction — the
      upper bound for any all-reduce's local phase.

    Returns a dict merged into the bench JSON (the model's
    latency/bandwidth constants become measured, not asserted).
    """
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("m",))

    @jax.jit
    @jax.shard_map(mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False)
    def one_psum(x):
        return jax.lax.psum(x, "m")

    x_small = jnp.ones((8, 128), jnp.float32)
    t_psum = timeit(one_psum, x_small, reps=200)

    big = jnp.ones((16 * 1024 * 1024,), jnp.float32)  # 64 MB

    @jax.jit
    def reduce_big(v):
        return jnp.sum(v)

    t_red = timeit(reduce_big, big, reps=30)
    gbps = big.size * 4 / (t_red * 1e-6) / 1e9
    return {
        "psum_dispatch_us": round(t_psum, 1),
        "hbm_reduce_gbps": round(gbps, 1),
    }


def main():
    from invcompcamtrack_tpu.core import lie, pose
    from invcompcamtrack_tpu.image.patch import extract_patches, extract_patches_grad
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.match.ncc import ncc_score
    from invcompcamtrack_tpu.sfm.triangulate import triangulate_dlt
    from invcompcamtrack_tpu.solver.icgn import steepest_descent_images

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (736, 1312)), jnp.float32)

    results = []

    def add(name, ref_us, n_small, n_big, fn_for):
        t_small = timeit(*fn_for(n_small))
        t_big = timeit(*fn_for(n_big))
        results.append(dict(
            kernel=name, reference_us=ref_us,
            tpu_us_at_ref_batch=round(t_small, 2), ref_batch=n_small,
            tpu_us_big_batch=round(t_big, 2), big_batch=n_big,
            tpu_ns_per_item_big=round(t_big / n_big * 1e3, 2),
        ))

    # patch extraction (util_getPatch 8x8: 0.08us/patch -> 8us/100)
    def mk_patch(n):
        c = jnp.asarray(rng.uniform(20, 600, (n, 2)), jnp.float32)
        f = jax.jit(lambda cc: extract_patches(img, cc, 8, 8))
        return (f, c)

    add("patch_gather_8x8", 8.0, 100, 25600, mk_patch)

    def mk_patchg(n):
        c = jnp.asarray(rng.uniform(20, 600, (n, 2)), jnp.float32)
        f = jax.jit(lambda cc: extract_patches_grad(img, img, img, cc, 8, 8))
        return (f, c)

    add("patch_gather_grad_8x8", 20.0, 100, 25600, mk_patchg)

    # projection (project_pt: 0.095us/100pts)
    def mk_proj(n):
        X = jnp.asarray(rng.normal(size=(n, 3)) + [0, 0, 10], jnp.float32)
        G = lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32))
        f = jax.jit(lambda Xa: pose.project_points(G, Xa, 500.0, 510.0, 320.0, 240.0))
        return (f, X)

    add("project_points", 0.095, 100, 262144, mk_proj)

    # SE3 exp (0.05us each)
    def mk_exp(n):
        p = jnp.asarray(rng.normal(size=(n, 6)) * 0.2, jnp.float32)
        return (jax.jit(lie.se3_exp), p)

    add("se3_exp", 0.05, 1, 65536, mk_exp)

    # steepest-descent images (8.562us/100 patches)
    def mk_sd(n):
        dx = jnp.asarray(rng.normal(size=(n, 8, 8)), jnp.float32)
        dy = jnp.asarray(rng.normal(size=(n, 8, 8)), jnp.float32)
        Xc = jnp.asarray(rng.normal(size=(n, 3)) + [0, 0, 10], jnp.float32)
        f = jax.jit(lambda a, b, c: steepest_descent_images(a, b, c, 500.0, 510.0))
        return (f, dx, dy, Xc)

    add("steepest_descent_images", 8.562, 100, 25600, mk_sd)

    # Hessian (16.097us/100 patches)
    def mk_hes(n):
        sd = jnp.asarray(rng.normal(size=(n, 6, 64)), jnp.float32)
        f = jax.jit(lambda s: jnp.einsum("nkp,nlp->kl", s, s,
                                         precision=jax.lax.Precision.HIGHEST))
        return (f, sd)

    add("hessian_6x6", 16.097, 100, 25600, mk_hes)

    # 6x6 solve (0.31us fullPivLu)
    def mk_solve(n):
        H = jnp.asarray(rng.normal(size=(n, 6, 6)), jnp.float32)
        H = H @ jnp.swapaxes(H, 1, 2) + 6 * jnp.eye(6)
        r = jnp.asarray(rng.normal(size=(n, 6, 1)), jnp.float32)
        f = jax.jit(lambda A, b: jnp.linalg.solve(A, b))
        return (f, H, r)

    add("solve_6x6", 0.31, 1, 4096, mk_solve)

    # NCC scoring (the run_track_nposes corr path)
    def mk_ncc(n):
        a = jnp.asarray(rng.normal(size=(n, 8, 8)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(n, 8, 8)), jnp.float32)
        return (jax.jit(ncc_score), a, b)

    add("ncc_score_8x8", 1.0, 100, 65536, mk_ncc)

    # batched DLT triangulation (triang.c has no timing; ~1us/pt scale)
    def mk_dlt(n):
        P = jnp.asarray(rng.normal(size=(4, 3, 4)), jnp.float32)
        Pb = jnp.broadcast_to(P, (n, 4, 3, 4))
        obs = jnp.asarray(rng.normal(size=(n, 4, 2)) * 100 + 300, jnp.float32)
        return (jax.jit(lambda p, o: triangulate_dlt(p, o)[0]), Pb, obs)

    add("triangulate_dlt_4view", 1.0, 100, 65536, mk_dlt)

    print(f"{'kernel':26s} {'ref us':>8s} {'tpu us (ref N)':>14s} "
          f"{'tpu us (big N)':>14s} {'ns/item big':>12s}")
    for r in results:
        print(f"{r['kernel']:26s} {r['reference_us']:8.3f} "
              f"{r['tpu_us_at_ref_batch']:14.2f} {r['tpu_us_big_batch']:14.2f} "
              f"{r['tpu_ns_per_item_big']:12.2f}")
    coll = bench_collective_latency()
    print(f"collective dispatch latency: {coll['psum_dispatch_us']} us; "
          f"on-chip reduce bandwidth: {coll['hbm_reduce_gbps']} GB/s")
    print(json.dumps({"metric": "kernel_microbench", "results": results,
                      "collective": coll}))


if __name__ == "__main__":
    main()
