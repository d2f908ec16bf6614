"""Analytic communication model for the distributed paths.

Multi-chip hardware is not reachable from this environment, so the
>=80% frames/s scaling target is supported by (a) mechanism tests on a
virtual CPU mesh (bench_scaling.py, tests/test_ba_distributed.py) and
(b) this explicit bytes-over-ICI model: every collective the sharded
programs execute is enumerable from shapes alone, and the resulting
per-step communication time on v5e ICI is orders of magnitude below the
measured per-step compute time, so scaling is compute-bound.

v5e numbers (public spec): 4 ICI links/chip x 100 GB/s aggregate
~ 1.6e11 B/s usable all-reduce bandwidth per chip; we use a
conservative 5e10 B/s effective all-reduce rate.
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_ICI_ALLREDUCE_BYTES_PER_S = 5e10


@dataclass
class CommModel:
    bytes_per_step: float
    comm_time_s: float
    compute_time_s: float

    @property
    def scaling_efficiency(self) -> float:
        """Modeled 1->N strong-scaling efficiency: compute shrinks with N
        (already folded into compute_time_s), comm does not."""
        return self.compute_time_s / (self.compute_time_s + self.comm_time_s)


def tracker_psum_bytes(batch: int, iters_per_scale: int, num_scales: int,
                       dtype_bytes: int = 4) -> float:
    """Point-axis (tp) sharded IC-GN: per scale one (B,6,6) Hessian psum
    + per iteration one (B,6) rhs psum (XLA-inserted under GSPMD)."""
    per_scale = batch * 36 * dtype_bytes
    per_iter = batch * 6 * dtype_bytes
    return num_scales * (per_scale + iters_per_scale * per_iter)


def ba_psum_bytes(K: int, lm_iters: int, reduced_solver: str = "dense",
                  cg_iters: int = 32, dtype_bytes: int = 4) -> float:
    """Landmark-sharded Schur BA: per LM iteration
    dense: Hpp (K,6,6) + bp (K,6) + S_off (6K)^2 + rhs (K,6)
    cg:    Hpp + bp + rhs + block-precond (K,6,6) + cg_iters x (K,6)."""
    hpp = K * 36 * dtype_bytes
    vec = K * 6 * dtype_bytes
    if reduced_solver == "dense":
        per_iter = hpp + vec + (6 * K) ** 2 * dtype_bytes + vec
    else:
        per_iter = hpp + vec + vec + hpp + cg_iters * vec
    return lm_iters * per_iter


def model_step(bytes_per_step: float, compute_time_s: float,
               n_collectives: int = 0,
               latency_per_collective_s: float = 0.0) -> CommModel:
    return CommModel(
        bytes_per_step=bytes_per_step,
        comm_time_s=(bytes_per_step / V5E_ICI_ALLREDUCE_BYTES_PER_S
                     + n_collectives * latency_per_collective_s),
        compute_time_s=compute_time_s,
    )


def engine_keyframe_psums(K: int, struct_iters: int, joint_iters: int,
                          reduced_solver: str = "dense", cg_iters: int = 32,
                          dtype_bytes: int = 4):
    """Collective traffic of ONE landmark-sharded engine keyframe step
    (vo/engine.py::_promote_commit with VOConfig.ba_mesh set, hybrid
    mode): the structure pre-pass + joint phase BA psums, plus the
    per-iteration scalar cost/count psums of the accept/reject loop.

    Returns (bytes_per_keyframe, n_collectives) — feed ``model_step``
    with a measured per-collective dispatch latency
    (bench_kernels.py::bench_collective_latency) for the full model.
    """
    iters = struct_iters + joint_iters
    ba_bytes = ba_psum_bytes(K, iters, reduced_solver, cg_iters, dtype_bytes)
    # accept/reject cost evaluation: 2 scalars (sum, count) per
    # candidate evaluation; per-landmark accept adds one more pass
    cost_evals = 2 * iters + 2
    scalar_bytes = cost_evals * 2 * dtype_bytes
    if reduced_solver == "dense":
        n_coll = iters * 4 + cost_evals
    else:
        n_coll = iters * (4 + cg_iters) + cost_evals
    return ba_bytes + scalar_bytes, n_coll


def temporal_ba_psum_bytes(L: int, lm_iters: int, cg_iters: int = 48,
                           dtype_bytes: int = 4) -> float:
    """Keyframe-sharded (SP) temporal BA (ba/temporal.py): per LM
    iteration the landmark-block psums Hxx (L,3,3) + bx (L,3), per CG
    iteration one (L,3) psum on the reduced camera system plus 2 scalar
    pdots, the back-substitution (L,3) psum, 2 cost psums (scalar
    sum+count), and 4 (6,)-vector ppermute halos (chain residual + rhs
    + per-matvec edges fold into the CG term).  Independent of K — the
    whole point of the SP layout: window length scales out with devices
    while the wire cost stays O(L)."""
    hxx = L * 9 * dtype_bytes
    lvec = L * 3 * dtype_bytes
    halo = 6 * dtype_bytes
    per_cg = lvec + 2 * dtype_bytes + 2 * halo
    per_iter = (hxx + lvec           # normal-equation landmark blocks
                + cg_iters * per_cg  # reduced-system PCG
                + lvec               # landmark back-substitution
                + 2 * 2 * dtype_bytes  # accept/reject cost psums
                + 4 * halo)          # chain residual/rhs edge exchange
    return lm_iters * per_iter
