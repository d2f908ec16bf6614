"""Temporal (keyframe-sharded) BA at scale — the SP product path
demonstrated on an actually-long window (VERDICT r4 ask #6).

Builds a K=32-keyframe / L=2048-landmark window with the production
robust configuration (0.3 px observation noise, 5% 40 px gross
outliers, Huber IRLS, odometry-chain priors, drifting initial poses)
and a REALISTIC long-window visibility structure: each landmark is
observed by a consecutive band of ~8 keyframes (sliding coverage, like
a real trajectory), so no single short window could solve it.

Solves it two ways and reports accuracy + per-solve latency + ICI
traffic:

- replicated: the engine's standard ``ba_solve`` (CG reduced solver)
  on ONE device — the single-chip long-window cost,
- temporal SP: ``temporal_ba_solve`` with the KEYFRAME axis sharded
  over 1/2/4/8 mesh devices (``VOConfig.ba_temporal_mesh``'s solver) —
  per-device work drops with the shard, psum traffic is O(L) per GN
  step independent of K.

Environment note (same caveat as bench_scaling.py): with one real TPU
chip this runs on VIRTUAL CPU devices (the script forces
JAX_PLATFORMS=cpu, xla_force_host_platform_device_count=8), so the
latency column is a mechanism check on shared host cores, not an ICI
hardware claim; the accuracy column and the analytic bytes/solve are
device-count-exact.  Writes the table printed here into the committed
docs (docs/architecture.md §8).

Usage (env on the COMMAND LINE — a sitecustomize may import jax before
this script body runs, so in-process env edits can come too late):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      PYTHONPATH=/root/repo:$PYTHONPATH python examples/run_temporal_scale.py
"""

import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
if len(jax.devices()) < 8:
    print(f"NOTE: only {len(jax.devices())} CPU device(s) visible — "
          f"set XLA_FLAGS=--xla_force_host_platform_device_count=8 "
          f"on the command line for the full scaling table")
import jax.numpy as jnp
from jax.sharding import Mesh

from invcompcamtrack_tpu.ba.temporal import (TemporalBAProblem,
                                             temporal_ba_solve)
from invcompcamtrack_tpu.ba.window import BAProblem, OdoFactors, ba_solve
from invcompcamtrack_tpu.ba.window import ba_residuals
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.parallel.model import temporal_ba_psum_bytes

K, L = 32, 2048
BAND = 8          # keyframes observing each landmark (sliding coverage)
CG_ITERS = 64
NUM_ITERS = 8


def _timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def build_problem():
    rng = np.random.default_rng(3)
    # forward trajectory with gentle sway; landmarks spread along it
    poses_gt = np.zeros((K, 6), np.float32)
    for k in range(1, K):
        poses_gt[k] = poses_gt[k - 1] + np.r_[
            0.01 * np.sin(k * 0.3), 0.005, 0.25,
            rng.normal(size=3) * 2e-3].astype(np.float32)
    centers = np.stack([
        -np.asarray(lie.se3_exp(jnp.asarray(p)))[:, :3].T
        @ np.asarray(lie.se3_exp(jnp.asarray(p)))[:, 3] for p in poses_gt])
    # landmark l belongs to band b = l * (K - BAND) // L: visible to
    # keyframes [b, b + BAND); placed ahead of its band's cameras
    band = (np.arange(L) * max(K - BAND, 1) // L).astype(np.int32)
    lms_gt = (centers[band]
              + rng.normal(size=(L, 3)) * [2.0, 2.0, 1.0]
              + [0, 0, 8.0]).astype(np.float32)
    kf_idx = np.arange(K)[:, None]
    mask = (kf_idx >= band[None, :]) & (kf_idx < band[None, :] + BAND)

    prob0 = BAProblem(
        poses=jnp.asarray(poses_gt), landmarks=jnp.asarray(lms_gt),
        obs=jnp.zeros((K, L, 2), jnp.float32), mask=jnp.asarray(mask),
        fx=jnp.float32(520.0), fy=jnp.float32(525.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        fixed_pose_mask=jnp.asarray(np.arange(K) < 2),
    )
    res0, _ = ba_residuals(prob0)
    obs = -res0  # exact projections
    # drop observations that fall outside a 640x480 frame
    inb = ((obs[..., 0] > 0) & (obs[..., 0] < 640)
           & (obs[..., 1] > 0) & (obs[..., 1] < 480))
    mask = prob0.mask & inb
    obs = obs + jnp.asarray(rng.normal(size=obs.shape) * 0.3, jnp.float32)
    outlier = jnp.asarray(rng.uniform(size=(K, L)) < 0.05)
    obs = jnp.where(outlier[..., None],
                    obs + jnp.asarray(rng.normal(size=obs.shape) * 40.0,
                                      jnp.float32), obs)

    # drifting initial poses (random-walk odometry error) + noisy map
    drift = np.cumsum(np.c_[rng.normal(size=(K, 3)) * 4e-3,
                            rng.normal(size=(K, 3)) * 1e-3], axis=0)
    drift[:2] = 0.0
    poses_init = jnp.asarray(poses_gt + drift, jnp.float32)
    lms_init = jnp.asarray(
        lms_gt + rng.normal(size=(L, 3)) * 0.05, jnp.float32)
    prob = prob0._replace(poses=poses_init, landmarks=lms_init,
                          obs=obs, mask=mask)

    # odometry chain measurements from GT + small noise
    G = lie.se3_exp(jnp.asarray(poses_gt))
    rel = jax.vmap(lambda a, b: lie.se3_compose(a, lie.se3_inverse(b)))(
        G, jnp.roll(G, 1, axis=0))
    return prob, jnp.asarray(poses_gt), rel, drift


def main():
    prob, poses_gt, rel, drift = build_problem()
    pe_in = float(jnp.abs(prob.poses - poses_gt)[2:].max())
    n_obs = int(np.asarray(prob.mask).sum())
    print(f"window: K={K} keyframes, L={L} landmarks, {n_obs} observations, "
          f"band={BAND}; max initial pose err {pe_in:.4f}")

    rows = []

    # --- replicated single-device joint solve (the engine default path)
    odo = OdoFactors(rel=rel, mask=jnp.asarray(np.arange(K) >= 1),
                     w_t=jnp.float32(100.0), w_r=jnp.float32(1000.0))
    f_rep = jax.jit(lambda pr: ba_solve(
        pr, num_iters=NUM_ITERS, huber_delta=1.5, reduced_solver="cg",
        cg_iters=CG_ITERS, lm_step_clip=0.1, damp_min=1e-5,
        lm_eig_floor=5e-3, odo=odo))
    poses_r, lms_r, (er, er0) = f_rep(prob)
    t_rep = _timeit(f_rep, prob)
    pe_rep = float(jnp.abs(poses_r - poses_gt)[2:].max())
    rows.append({"solver": "replicated ba_solve (cg)", "devices": 1,
                 "max_pose_err": round(pe_rep, 4),
                 "err": round(float(er), 4), "err0": round(float(er0), 4),
                 "solve_ms": round(t_rep * 1e3, 1), "ici_bytes": 0})
    print(json.dumps(rows[-1]))

    # --- temporal SP solve over 1/2/4/8 devices
    rel_next = jnp.roll(rel, -1, axis=0)
    odom_pred = jax.vmap(
        lambda R, p: lie.se3_log(lie.se3_compose(R, lie.se3_exp(p)))
    )(rel_next, prob.poses)
    odom = odom_pred - prob.poses
    w6 = jnp.concatenate([jnp.full((3,), 1e4, jnp.float32),
                          jnp.full((3,), 1e6, jnp.float32)])
    w = jnp.where((jnp.arange(K) < K - 1)[:, None], w6, 0.0)
    tprob = TemporalBAProblem(
        poses=prob.poses, landmarks=prob.landmarks, obs=prob.obs,
        mask=prob.mask, fx=prob.fx, fy=prob.fy, cx=prob.cx, cy=prob.cy,
        fixed_pose_mask=prob.fixed_pose_mask, odom=odom, odom_weight=w)

    for nd in (1, 2, 4, 8):
        if nd > len(jax.devices()):
            continue
        mesh = Mesh(np.asarray(jax.devices()[:nd]), axis_names=("seq",))
        f_sp = jax.jit(lambda pr, m=mesh: temporal_ba_solve(
            pr, m, num_iters=NUM_ITERS, huber_delta=1.5,
            cg_iters=CG_ITERS))
        poses_t, lms_t, (et, et0) = f_sp(tprob)
        t_sp = _timeit(f_sp, tprob)
        pe_t = float(jnp.abs(poses_t - poses_gt)[2:].max())
        rows.append({"solver": "temporal SP (keyframe-sharded)",
                     "devices": nd,
                     "max_pose_err": round(pe_t, 4),
                     "err": round(float(et), 4),
                     "err0": round(float(et0), 4),
                     "solve_ms": round(t_sp * 1e3, 1),
                     "ici_bytes": int(temporal_ba_psum_bytes(
                         L, NUM_ITERS, CG_ITERS))})
        print(json.dumps(rows[-1]))

    print(json.dumps({"metric": "temporal_ba_scale", "K": K, "L": L,
                      "band": BAND, "n_obs": n_obs,
                      "max_initial_pose_err": round(pe_in, 4),
                      "rows": rows}))


if __name__ == "__main__":
    main()
