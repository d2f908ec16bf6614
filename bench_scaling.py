"""Multi-device scaling measurement.

Runs the batched IC-GN tracking step data-parallel over an n-device
mesh and reports throughput at 1, 2, ..., N devices plus scaling
efficiency (the north star asks >= 80% frames/s scaling 1 -> N).

On real multi-chip hardware this measures ICI scaling; in this
environment (one real chip) it runs on virtual CPU devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
to validate the sharded program and the efficiency methodology —
CPU-device "scaling" shares one host's cores, so treat those numbers as
a mechanism check, not a hardware claim.

Prints one JSON line with per-device-count throughput + efficiency.
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
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    from invcompcamtrack_tpu.config import ICGNParams
    from invcompcamtrack_tpu.core import lie
    from invcompcamtrack_tpu.core.camera import CameraPyramid
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.parallel.mesh import make_mesh
    from invcompcamtrack_tpu.solver.icgn import track_pose_batch
    from invcompcamtrack_tpu.vo import synthetic

    devices = jax.devices()
    n_total = len(devices)
    per_dev_batch = 16
    N = 100
    cfg = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)

    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(rng, wh=(640, 480), fc=(600.0, 610.0))
    exp_np = lambda p: np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)), np.float64)
    img_ref = synthetic.render(scene, exp_np(np.zeros(6)))
    img_new = synthetic.render(scene, exp_np(np.r_[0.01, 0.005, 0, 0.003, 0, 0]))
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, cfg.num_levels, cfg.psz)
    pyr_ref = build_pyramid(jnp.asarray(img_ref, jnp.float32), cfg.num_levels, cfg.psz)
    pyr_new = build_pyramid(jnp.asarray(img_new, jnp.float32), cfg.num_levels, cfg.psz)

    rows = []
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_total]
    for n_dev in counts:
        mesh = make_mesh(n_dev, 1, devices=devices[:n_dev])
        B = per_dev_batch * n_dev
        X = jnp.asarray(
            np.stack([synthetic.sample_plane_points(scene, rng, N) for _ in range(B)]),
            jnp.float32,
        )
        p0 = jnp.zeros((B, 6), jnp.float32)
        sh = NamedSharding(mesh, P("data"))
        X = jax.device_put(X, NamedSharding(mesh, P("data", None, None)))
        p0 = jax.device_put(p0, sh)
        step = jax.jit(
            lambda a, b, Xa, pa: track_pose_batch(a, b, Xa, pa, cam, cfg),
            out_shardings=sh,
        )
        out = step(pyr_ref, pyr_new, X, p0)
        out.block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = step(pyr_ref, pyr_new, X, p0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        rows.append({"devices": n_dev, "pairs_per_s": round(B / dt, 1)})

    base = rows[0]["pairs_per_s"]
    for r in rows:
        r["efficiency"] = round(r["pairs_per_s"] / (base * r["devices"]), 3)
        print(f"devices {r['devices']:2d}: {r['pairs_per_s']:8.1f} pairs/s "
              f"(efficiency {r['efficiency']:.2f})")

    # analytic ICI model (parallel/model.py): per-step collective bytes
    # vs the measured single-device compute time — the multi-chip
    # scaling evidence this single-chip environment can produce
    from invcompcamtrack_tpu.parallel.model import (
        model_step,
        tracker_psum_bytes,
    )
    t_compute = per_dev_batch / base  # s per device-step at batch/device
    m = model_step(
        tracker_psum_bytes(per_dev_batch, cfg.maxiter, cfg.num_levels),
        t_compute,
    )
    modeled = {
        "ici_bytes_per_step": m.bytes_per_step,
        "modeled_comm_time_s": round(m.comm_time_s, 9),
        "modeled_scaling_efficiency": round(m.scaling_efficiency, 5),
    }
    print(f"modeled ICI: {m.bytes_per_step:.3g} B/step -> "
          f"{m.comm_time_s * 1e6:.2f} us vs {t_compute * 1e3:.2f} ms compute "
          f"-> efficiency {m.scaling_efficiency:.4f}")
    print(json.dumps({"metric": "scaling", "backend": jax.default_backend(),
                      "rows": rows, "modeled": modeled}))


if __name__ == "__main__":
    main()
