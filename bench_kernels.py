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

from invcompcamtrack_tpu.utils import jaxcache

jaxcache.enable()
import jax.numpy as jnp


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def bench_solver_stages(B=256, N=100):
    """Per-stage timing of the headline solver at the bench shape — the
    breakdown behind the roofline argument (docs/kernels.md).  Times the
    dual gather (per scale), the fused iteration kernel, and the Hessian
    assembly in isolation, then reports the modeled floor for each."""
    from invcompcamtrack_tpu.config import ICGNParams
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.ops import icgn_iter_pallas as fi
    from invcompcamtrack_tpu.ops.patch_pallas import (
        gather_ref_grad_and_windows)

    cfg = ICGNParams(lv_f=4, lv_l=0, psz=8, maxiter=10)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (720, 1280)), jnp.float32)
    pyr = build_pyramid(img, cfg.num_levels, cfg.psz)
    M = B * N
    win = cfg.window_size
    out = {}
    for lvl in (0, 2, 4):
        H, W = pyr[lvl].img.shape
        uv = jnp.asarray(
            np.c_[rng.uniform(4, W - 24 - 2 * cfg.psz, M),
                  rng.uniform(4, H - 24 - 2 * cfg.psz, M)], jnp.float32)
        org = jnp.floor(uv).astype(jnp.int32)
        f = jax.jit(lambda a, b: gather_ref_grad_and_windows(
            pyr[lvl].img, pyr[lvl].img, a, b, cfg.psz, cfg.psz, win))
        t = timeit(f, uv, org, reps=20)
        out[f"dual_gather_lv{lvl}_us"] = round(t, 1)
        out[f"dual_gather_lv{lvl}_ns_per_pt"] = round(t * 1e3 / M, 1)

    # the fused per-iteration kernel at the same shape
    n_str = fi.PSZ * fi.WIN
    qwin = jnp.asarray(rng.uniform(0, 255, (M, win * win)), jnp.float32)
    refs = jnp.asarray(rng.uniform(-1, 1, (M, n_str)), jnp.float32)
    row_w = jnp.asarray(rng.integers(0, win - cfg.psz, M), jnp.int32)
    col_w = jnp.asarray(rng.integers(0, win - cfg.psz, M), jnp.int32)
    wts = jnp.asarray(rng.uniform(0, 1, (M, 4)), jnp.float32)
    vmask = jnp.ones((M,), bool)
    g = jax.jit(lambda *a: fi.fused_resample_project(*a))
    t_it = timeit(g, qwin, refs, refs, refs, row_w, col_w, wts, vmask,
                  reps=30)
    out["iter_kernel_us"] = round(t_it, 1)
    out["iter_kernel_ns_per_pt"] = round(t_it * 1e3 / M, 2)
    return out


def bench_prefetch_ab(B=256, N=100):
    """A/B of the shipped dual gather vs the prefetch-pipelined redesign
    (ops/patch_prefetch.py) at the bench shape — the measurement behind
    the round-5 dismissal (docs/kernels.md §prefetch).  Asserts the two
    are bit-identical before timing."""
    from invcompcamtrack_tpu.config import ICGNParams
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.ops import patch_prefetch as pf
    from invcompcamtrack_tpu.ops.patch_pallas import (
        gather_ref_grad_and_windows)

    cfg = ICGNParams(lv_f=4, lv_l=0, psz=8, maxiter=10)
    if not pf.supported(cfg.psz, cfg.window_size, shape=(720, 1280)):
        return {"prefetch_ab": "unsupported (not on TPU)"}
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (720, 1280)), jnp.float32)
    pyr = build_pyramid(img, cfg.num_levels, cfg.psz)
    M = B * N
    win = cfg.window_size
    out = {}
    for lvl in (0, 4):
        H, W = pyr[lvl].img.shape
        uv = jnp.asarray(
            np.c_[rng.uniform(4, W - 24 - 2 * cfg.psz, M),
                  rng.uniform(4, H - 24 - 2 * cfg.psz, M)], jnp.float32)
        org = jnp.floor(uv).astype(jnp.int32)
        f_s = jax.jit(lambda a, b, l=lvl: gather_ref_grad_and_windows(
            pyr[l].img, pyr[l].img, a, b, cfg.psz, cfg.psz, win))
        f_p = jax.jit(lambda a, b, l=lvl:
                      pf.gather_ref_grad_and_windows_prefetch(
                          pyr[l].img, pyr[l].img, a, b, cfg.psz, cfg.psz,
                          win))
        o_s, o_p = f_s(uv, org), f_p(uv, org)
        err = max(float(jnp.abs(a - b).max()) for a, b in zip(o_s, o_p))
        assert err == 0.0, f"prefetch not bit-exact: {err}"
        t_s = timeit(f_s, uv, org, reps=20)
        t_p = timeit(f_p, uv, org, reps=20)
        out[f"prefetch_ab_lv{lvl}"] = {
            "shipped_ns_per_pt": round(t_s * 1e3 / M, 1),
            "prefetch_ns_per_pt": round(t_p * 1e3 / M, 1),
            "speedup": round(t_s / t_p, 2)}
    return out


def bench_ncc3(S=64, N=100, wh=(640, 480)):
    """Fused NCC verification scorer vs the XLA path at the RANSAC
    chain-verification shape (S pose samples x N inlier points,
    reference: run_track_nposes.cpp:271-355)."""
    from invcompcamtrack_tpu.image.patch import extract_patches
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.match.ncc import ncc_score
    from invcompcamtrack_tpu.ops.ncc_pallas import ncc3_available, ncc3_scores

    psz = 8
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (wh[1], wh[0])), jnp.float32)
    pyr = build_pyramid(img, 3, psz)
    img_l = pyr[0].img
    uvs = [jnp.asarray(
        np.c_[rng.uniform(8, wh[0] - 8, S * N),
              rng.uniform(8, wh[1] - 8, S * N)], jnp.float32)
        for _ in range(3)]

    def xla_path(u0, u1, u2):
        pats = [extract_patches(img_l, u, psz, psz, patch_norm=True)
                for u in (u0, u1, u2)]
        return ncc_score(pats[0], pats[1]), ncc_score(pats[1], pats[2])

    t_xla = timeit(jax.jit(xla_path), *uvs, reps=20)
    out = {"ncc3_xla_us": round(t_xla, 1)}
    if ncc3_available(img_l.shape, img_l.dtype, psz):
        f = jax.jit(lambda a, b, c: ncc3_scores(
            img_l, img_l, img_l, a, b, c, psz=psz, padding=psz))
        # parity guard before timing
        cbr, crf = f(*uvs)
        cbr_x, crf_x = jax.jit(xla_path)(*uvs)
        err = max(float(jnp.abs(cbr - cbr_x).max()),
                  float(jnp.abs(crf - crf_x).max()))
        assert err < 1e-4, f"ncc3 mismatch {err}"
        t_fused = timeit(f, *uvs, reps=20)
        out.update(ncc3_fused_us=round(t_fused, 1),
                   ncc3_speedup=round(t_xla / t_fused, 2),
                   ncc3_parity_err=f"{err:.1e}")
    return out


def bench_engine_stages():
    """Per-stage breakdown of the engine keyframe step at the bench
    shape (720p, 512 landmarks, window 5) — the profile behind the
    frame-rate work (VERDICT round 2 weak #3).  Times the engine's own
    sub-stage programs: pyramid, IC-GN track, LK re-observation,
    corner+triangulate, ring-write+BA+commit."""
    from invcompcamtrack_tpu.config import ICGNParams
    from invcompcamtrack_tpu.core.camera import CameraPyramid
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.vo import synthetic
    from invcompcamtrack_tpu.vo.engine import (
        VisualOdometry, VOConfig, _promote_commit, _promote_reobserve,
        _promote_triangulate, _track_frame)
    from tests.oracles import geometry_np as geo

    rng = np.random.default_rng(1)
    scene = synthetic.make_scene(rng, wh=(1280, 720), fc=(1000.0, 1200.0),
                                 z0=8.0, freq_range=(0.5, 6.0))
    tracker = ICGNParams(lv_f=4, lv_l=0, psz=8, maxiter=10)
    cfg = VOConfig(tracker=tracker, max_landmarks=512, window=5,
                   keyframe_stride=2, corners_per_kf=512, min_parallax_px=1.0)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)
    poses = [np.zeros(6)]
    for i in range(1, 10):
        poses.append(poses[-1] + np.r_[0.02, 0.01 * np.sin(i * 0.3), 0.01,
                                       rng.normal(size=3) * 0.001])
    frames = [synthetic.render(scene, geo.se3_exp(p)).astype(np.float32)
              for p in poses]
    vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
    seeds = synthetic.sample_plane_points(scene, rng, 400, margin=24)
    vo.bootstrap(frames[0], frames[1], poses[0], poses[1], seeds)
    for i in range(2, 8):
        vo.process_frame(frames[i])
    state = vo.state
    img = jnp.asarray(frames[8])

    f_pyr = jax.jit(lambda im: build_pyramid(im, tracker.num_levels,
                                             tracker.psz))
    pyr = f_pyr(img)
    f_track = jax.jit(lambda st, py: _track_frame(st, py, cam, tracker))
    p_new = f_track(state, pyr)
    f_reobs = jax.jit(lambda st, py, p: _promote_reobserve(st, py, p, cam,
                                                           cfg))
    ro = f_reobs(state, pyr, p_new)
    f_tri = jax.jit(lambda st, py, p, r: _promote_triangulate(st, py, p,
                                                              cam, cfg, r))
    tri = f_tri(state, pyr, p_new, ro)
    f_commit = jax.jit(lambda st, py, p, t: _promote_commit(st, py, p, cam,
                                                            cfg, t))
    jax.block_until_ready(f_commit(state, pyr, p_new, tri).cur_pose)

    out = {
        "pyramid_ms": round(timeit(f_pyr, img, reps=20) / 1e3, 2),
        "icgn_track_ms": round(timeit(f_track, state, pyr, reps=10) / 1e3, 2),
        "lk_reobserve_ms": round(timeit(f_reobs, state, pyr, p_new,
                                        reps=10) / 1e3, 2),
        "corner_triangulate_ms": round(timeit(f_tri, state, pyr, p_new, ro,
                                              reps=10) / 1e3, 2),
        "ba_commit_ms": round(timeit(f_commit, state, pyr, p_new, tri,
                                     reps=10) / 1e3, 2),
    }
    return out


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
    ncc = bench_ncc3()
    print("ncc3:", ncc)
    stages = bench_solver_stages()
    print("solver stages:", stages)
    pfab = bench_prefetch_ab()
    print("prefetch A/B:", pfab)
    eng = bench_engine_stages()
    print("engine stages:", eng)
    print(json.dumps({"metric": "kernel_microbench", "results": results,
                      "collective": coll, "ncc3": ncc,
                      "solver_stages": stages, "prefetch_ab": pfab,
                      "engine_stages": eng}))


if __name__ == "__main__":
    main()
