"""Device-stage pipeline parallelism (PP) for streaming sequences.

SURVEY §2.4 maps the reference's inherently sequential frame chain
(reference: run_track_nposes.cpp:232-258 tracks pose hypotheses frame to
frame) onto TPU as *stage* pipelining: the per-window work
pyramid -> track -> triangulate -> refine is laid out across devices on
a mesh axis, and a stream of frame-window microbatches flows through the
stages GPipe-style.  Stage s of microbatch m runs at tick m + s, so in
steady state all P devices are busy and throughput is one microbatch per
tick (vs one per P ticks sequentially).

TPU-native design decisions:

- SPMD, not MPMD: one program runs on every device inside ``shard_map``
  over the ``stage`` mesh axis; each device picks its stage body with
  ``lax.switch`` on ``lax.axis_index``.  XLA compiles all stage bodies
  once; at runtime each device executes only its own branch.
- Inter-stage transfers are ``lax.ppermute`` ring hops over ICI — the
  natural point-to-point collective for a linear pipeline (each hop
  moves exactly one microbatch payload between physical neighbours).
- Payloads are a single fixed-shape f32 buffer: heterogeneous stages
  pack/unpack their real inputs/outputs into the carrier (fixed shapes
  are what make the whole tick loop one ``lax.scan`` inside one jit).

The combinator is generic; ``vo_stage_fns`` provides the VO chain
(pyramid / track / triangulate / refine) used by the dryrun and tests.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_run(stage_fns: Sequence[Callable], xs: jnp.ndarray,
                 mesh: Mesh, axis: str = "stage") -> jnp.ndarray:
    """Stream microbatches through per-device stages.

    stage_fns: P callables, each ``(S,) f32 -> (S,) f32`` (pack/unpack
    inside); P must equal the size of ``mesh`` axis ``axis``.
    xs: (T, S) microbatch stream.  Returns (T, S): microbatch t's output
    after all P stages (available at tick t + P - 1).

    The returned array is replicated over the axis (one final psum).
    """
    n_stage = mesh.shape[axis]
    if len(stage_fns) != n_stage:
        raise ValueError(f"{len(stage_fns)} stages != mesh axis {n_stage}")
    T, S = xs.shape
    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def spmd(xs_rep):
        idx = jax.lax.axis_index(axis)

        def tick(buf, t):
            # receive the neighbour's last output (stage 0 takes a fresh
            # microbatch from the stream instead)
            prev = jax.lax.ppermute(buf, axis, perm)
            t_in = jnp.clip(t, 0, T - 1)
            x_t = jax.lax.dynamic_index_in_dim(xs_rep, t_in, 0, False)
            inp = jnp.where(idx == 0, x_t, prev)
            out = jax.lax.switch(idx, list(stage_fns), inp)
            # the last stage emits microbatch t - (P-1) at tick t
            emit = jnp.where(idx == n_stage - 1, out, jnp.zeros_like(out))
            return out, emit

        ticks = jnp.arange(T + n_stage - 1)
        _, emits = jax.lax.scan(tick, jnp.zeros((S,), xs_rep.dtype), ticks)
        # replicate the last stage's emissions to every device
        ys = jax.lax.psum(emits, axis)
        return ys[n_stage - 1:]

    fn = jax.shard_map(spmd, mesh=mesh, in_specs=P(), out_specs=P(),
                       check_vma=False)
    return fn(xs)


def sequential_reference(stage_fns: Sequence[Callable],
                         xs: jnp.ndarray) -> jnp.ndarray:
    """Oracle: the same stages composed sequentially per microbatch."""
    def one(x):
        for f in stage_fns:
            x = f(x)
        return x
    return jax.vmap(one)(xs)


# ---------------------------------------------------------------------------
# The VO stage chain on the carrier-buffer convention.


def _pack(img, uv, extra):
    # normalize dtype + weak-type so all stage bodies have identical
    # output aval (lax.switch requires exact type equality)
    return jnp.concatenate([img.reshape(-1), uv.reshape(-1),
                            extra.reshape(-1)]).astype(jnp.float32)


def vo_stage_fns(hw: tuple, n_pts: int, fc: tuple, cc: tuple):
    """Pyramid -> LK-style track -> triangulate -> refine as carrier-
    buffer stages for ``pipeline_run``.

    Carrier layout: [img (H*W), uv (n_pts*2), extra (n_pts*4)] where
    extra rows carry per-point scratch: depth estimate + residual terms.
    The bodies are intentionally compact single-step versions of the
    real subsystems (build one pyramid level, one GN flow step, one
    midpoint triangulation, one depth refinement) — the pipelining is
    what is under test/measurement; each stage is a real tensor program
    with the real op mix (reduce, gather-free warp, solve).
    """
    H, W = hw
    S_img, S_uv = H * W, n_pts * 2

    def unpack(buf):
        img = buf[:S_img].reshape(H, W)
        uv = buf[S_img:S_img + S_uv].reshape(n_pts, 2)
        extra = buf[S_img + S_uv:].reshape(n_pts, 4)
        return img, uv, extra

    def stage_pyramid(buf):
        img, uv, extra = unpack(buf)
        # one smoothing level: 3x3 binomial blur (the pyramid kernel)
        k = jnp.array([0.25, 0.5, 0.25])
        sm = jnp.apply_along_axis(lambda r: jnp.convolve(r, k, "same"), 1, img)
        sm = jnp.apply_along_axis(lambda c: jnp.convolve(c, k, "same"), 0, sm)
        return _pack(sm, uv, extra)

    def stage_track(buf):
        img, uv, extra = unpack(buf)
        gy, gx = jnp.gradient(img)
        ui = jnp.clip(uv[:, 0].astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(uv[:, 1].astype(jnp.int32), 0, H - 1)
        g = jnp.stack([gx[vi, ui], gy[vi, ui]], axis=1)
        r = img[vi, ui] - 128.0
        # one diagonal GN step toward the local mean intensity
        duv = -g * (r / (jnp.sum(g * g, axis=1) + 1e-3))[:, None]
        return _pack(img, uv + 0.1 * duv, extra)

    def stage_triangulate(buf):
        img, uv, extra = unpack(buf)
        # inverse-depth init from the pixel offset (midpoint-style)
        x = (uv[:, 0] - cc[0]) / fc[0]
        y = (uv[:, 1] - cc[1]) / fc[1]
        depth = 8.0 / (1.0 + 0.05 * jnp.sqrt(x * x + y * y))
        extra = extra.at[:, 0].set(depth)
        return _pack(img, uv, extra)

    def stage_refine(buf):
        img, uv, extra = unpack(buf)
        # one damped depth-refinement step against the ray constraint
        depth = extra[:, 0]
        target = 8.0
        depth = depth + 0.5 * (target - depth) / (1.0 + depth)
        extra = extra.at[:, 0].set(depth)
        return _pack(img, uv, extra)

    return [stage_pyramid, stage_track, stage_triangulate, stage_refine]
