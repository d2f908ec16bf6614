"""Pipeline parallelism over the REAL VO chain (round 3).

``parallel/pipeline.py`` provides the generic GPipe-style SPMD
combinator; this module instantiates it on the engine's actual
per-keyframe programs — the decomposition of ``vo.engine._keyframe_step``
into its four sub-stages:

  stage 0: pyramid build + IC-GN pose track     (engine._track_frame)
  stage 1: measured LK re-observation           (engine._promote_reobserve)
  stage 2: corner detect + LK + triangulation   (engine._promote_triangulate)
  stage 3: ring write + windowed BA + commit    (engine._promote_commit)

The frame chain is RECURRENT (stage 3's state feeds the next window's
stage 0 — the same inherent sequentiality as the reference's
frame-to-frame chain, reference: run_track_nposes.cpp:229-265), so a
single stream cannot be pipelined without going stale.  The TPU-native
answer is **interleaved independent streams**: with R = P streams
round-robined into the P-stage ring, stream r's window w+1 enters
stage 0 exactly P ticks after window w entered — precisely when its
stage-3 output arrives back over the ring wraparound hop.  Every device
is busy every tick, and every stream computes EXACTLY the sequential
engine program (parity-by-construction: the stages are the engine's own
functions; pinned by tests/test_pipeline.py).

Carrier convention: one fixed-shape f32 vector per stream in flight,
segmented [ state | pyramid | pose(6) | extra | frame ] where ``extra``
holds whichever stage boundary (_ReobsOut / _TriOut) is live, padded to
the max of the two.  Fixed shapes keep the whole tick loop one lax.scan
inside one jit; ``lax.switch`` on ``lax.axis_index`` picks the stage
body per device; ``lax.ppermute`` ring hops move carriers over ICI.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, PartitionSpec as P

from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.vo.engine import (
    VOConfig,
    VOState,
    _promote_commit,
    _promote_reobserve,
    _promote_triangulate,
    _track_frame,
    make_empty_state,
)

N_STAGES = 4


class _Seg(NamedTuple):
    """One carrier segment: offset, length, and the unravel closure."""

    off: int
    size: int
    unravel: object
    dtype: object  # the ravel dtype (unravel expects this)


class VOPipelineSpec(NamedTuple):
    """Static carrier layout + the four stage bodies."""

    stage_fns: tuple
    carrier_size: int
    seg_pose: _Seg
    seg_frame: _Seg
    pack_state_fn: object    # (carrier, VOState) -> carrier
    unpack_state_fn: object  # carrier -> VOState

    def pack_init(self, state: VOState) -> jnp.ndarray:
        """Carrier holding a bootstrapped stream state (frame injected
        by the combinator at stage-0 ingestion)."""
        buf = jnp.zeros((self.carrier_size,), jnp.float32)
        return self.pack_state_fn(buf, state)

    def unpack_state(self, buf) -> VOState:
        return self.unpack_state_fn(buf)

    def unpack_pose(self, buf) -> jnp.ndarray:
        s = self.seg_pose
        return jax.lax.dynamic_slice(buf, (s.off,), (6,))

    def inject_frame(self, buf, img) -> jnp.ndarray:
        s = self.seg_frame
        return jax.lax.dynamic_update_slice(
            buf, img.reshape(-1).astype(jnp.float32), (s.off,))


def _zeros_of(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def make_vo_pipeline(cam: CameraPyramid, cfg: VOConfig, wh,
                     dtype=jnp.float32,
                     slim_carrier: bool = True) -> VOPipelineSpec:
    """Build the carrier layout and the four stage bodies for image size
    ``wh`` = (W, H).  The pipelined engine promotes EVERY frame
    (keyframe_stride must be 1: each microbatch is one keyframe step).

    ``slim_carrier`` (the default) ships the K keyframe FRAMES instead
    of their pyramid stacks, and no current-frame pyramid segment at
    all: every stage rebuilds the pyramids it needs at entry.  This is
    bit-exact — ``build_pyramid`` is deterministic and a pyramid's
    level-0 interior IS the edge-padded source frame — and shrinks the
    720p K=5 carrier ~4.5x (96.7 MB -> 21.7 MB, docs/architecture.md
    §7), the identified slimming for the off-chip/DCN regimes where PP
    earns its keep.  Cost: one batched (K+1)-pyramid rebuild per stage,
    pure recompute with zero wire bytes.  ``slim_carrier=False`` keeps
    the round-3 pyramids-on-the-ring layout for A/B measurement."""
    if cfg.keyframe_stride != 1:
        raise ValueError("pipelined VO requires keyframe_stride=1 "
                         "(one keyframe step per microbatch)")
    cfgt = cfg.tracker
    H, W = int(wh[1]), int(wh[0])
    K = cfg.window
    psz = cfgt.psz

    # --- example trees (zeros) -> segment sizes + unravel closures ---
    state_ex = make_empty_state(cfg, wh, dtype)
    img_ex = jnp.zeros((H, W), dtype)
    pyr_ex = _zeros_of(jax.eval_shape(
        lambda i: build_pyramid(i, cfgt.num_levels, psz), img_ex))
    p_ex = jnp.zeros((6,), dtype)
    ro_ex = _zeros_of(jax.eval_shape(
        lambda s, py, p: _promote_reobserve(s, py, p, cam, cfg),
        state_ex, pyr_ex, p_ex))
    tri_ex = _zeros_of(jax.eval_shape(
        lambda s, py, p, r: _promote_triangulate(s, py, p, cam, cfg, r),
        state_ex, pyr_ex, p_ex, ro_ex))

    # slim: the state segment raveled WITHOUT the kf pyramid stacks
    # (kf_pyr=() is a zero-leaf pytree); frames ride in their own segment
    state_ravel_ex = state_ex._replace(kf_pyr=()) if slim_carrier \
        else state_ex
    f_state, unr_state = ravel_pytree(state_ravel_ex)
    f_pyr, unr_pyr = ravel_pytree(pyr_ex)
    f_ro, unr_ro = ravel_pytree(ro_ex)
    f_tri, unr_tri = ravel_pytree(tri_ex)
    n_state, n_pyr = f_state.size, f_pyr.size
    n_extra = max(f_ro.size, f_tri.size)
    n_frame = H * W
    n_kff = K * H * W if slim_carrier else 0

    off_state = 0
    off_kff = n_state                      # slim only (n_kff = 0 otherwise)
    off_pyr = off_kff + n_kff              # fat only (segment absent in slim)
    off_pose = off_pyr + (0 if slim_carrier else n_pyr)
    off_extra = off_pose + 6
    off_frame = off_extra + n_extra
    size = off_frame + n_frame

    def get(buf, off, n):
        return jax.lax.dynamic_slice(buf, (off,), (n,))

    def put(buf, off, flat):
        return jax.lax.dynamic_update_slice(
            buf, flat.astype(jnp.float32), (off,))

    def u_state(buf):
        st = unr_state(get(buf, off_state, n_state).astype(f_state.dtype))
        if slim_carrier:
            kff = get(buf, off_kff, n_kff).reshape(K, H, W).astype(dtype)
            st = st._replace(
                kf_pyr=tuple(build_pyramid(kff, cfgt.num_levels, psz)))
        return st

    def pack_state(buf, st: VOState):
        if slim_carrier:
            # level-0 interior == the source frame (pad_level edge-pads)
            kff = st.kf_pyr[0].img[:, psz:-psz, psz:-psz]
            buf = put(buf, off_kff, kff.reshape(-1))
            st = st._replace(kf_pyr=())
        return put(buf, off_state, ravel_pytree(st)[0])

    def u_pyr(buf):
        if slim_carrier:
            img = get(buf, off_frame, n_frame).reshape(H, W).astype(dtype)
            return build_pyramid(img, cfgt.num_levels, psz)
        return unr_pyr(get(buf, off_pyr, n_pyr).astype(f_pyr.dtype))

    def u_pose(buf):
        return get(buf, off_pose, 6).astype(dtype)

    # --- the four stage bodies (carrier -> carrier) ---

    def stage_track(buf):
        state = u_state(buf)
        img = get(buf, off_frame, n_frame).reshape(H, W).astype(dtype)
        pyr = build_pyramid(img, cfgt.num_levels, psz)
        p_new = _track_frame(state, pyr, cam, cfgt)
        if not slim_carrier:
            buf = put(buf, off_pyr, ravel_pytree(pyr)[0])
        return put(buf, off_pose, p_new)

    def stage_reobserve(buf):
        ro = _promote_reobserve(u_state(buf), u_pyr(buf), u_pose(buf),
                                cam, cfg)
        flat = ravel_pytree(ro)[0]
        return put(buf, off_extra, jnp.zeros((n_extra,), jnp.float32)
                   .at[:flat.size].set(flat.astype(jnp.float32)))

    def stage_triangulate(buf):
        ro = unr_ro(get(buf, off_extra, f_ro.size).astype(f_ro.dtype))
        tri = _promote_triangulate(u_state(buf), u_pyr(buf), u_pose(buf),
                                   cam, cfg, ro)
        flat = ravel_pytree(tri)[0]
        return put(buf, off_extra, jnp.zeros((n_extra,), jnp.float32)
                   .at[:flat.size].set(flat.astype(jnp.float32)))

    def stage_commit(buf):
        state = u_state(buf)
        tri = unr_tri(get(buf, off_extra, f_tri.size).astype(f_tri.dtype))
        st2 = _promote_commit(state, u_pyr(buf), u_pose(buf), cam, cfg, tri)
        st2 = st2._replace(frame_idx=state.frame_idx + 1)
        buf = pack_state(buf, st2)
        return put(buf, off_pose, st2.cur_pose)

    return VOPipelineSpec(
        stage_fns=(stage_track, stage_reobserve, stage_triangulate,
                   stage_commit),
        carrier_size=size,
        seg_pose=_Seg(off_pose, 6, None, dtype),
        seg_frame=_Seg(off_frame, n_frame, None, dtype),
        pack_state_fn=pack_state,
        unpack_state_fn=u_state,
    )


def vo_pipeline_run(spec: VOPipelineSpec, init_states, frames,
                    mesh: Mesh, axis: str = "stage"):
    """Run R = mesh[axis] interleaved VO streams through the 4-stage
    ring.

    init_states: R bootstrapped ``VOState``s (list or tuple).
    frames: (R, W, H, Wd) — stream-major window frames.
    Returns (poses (R, W, 6), final_states list of R VOState) — exactly
    what R sequential engines would produce.

    Schedule: tick t ingests stream ``t % R`` window ``t // R`` at
    stage 0; its committed carrier emits from stage 3 at tick t + 3 and
    ring-wraps straight back into stage 0 for the stream's next window.
    Total ticks = R*W + 3 for R*W keyframe steps: steady-state
    throughput is one keyframe step per tick with all devices busy.
    """
    R = mesh.shape[axis]
    if R != N_STAGES:
        raise ValueError(f"mesh axis {axis}={R}, need {N_STAGES} "
                         "(streams are round-robined over stages)")
    frames = jnp.asarray(frames, jnp.float32)
    n_stream, n_win = frames.shape[:2]
    if n_stream != R:
        raise ValueError(f"{n_stream} streams != {R} stages")
    n_in = R * n_win
    n_ticks = n_in + N_STAGES - 1
    S = spec.carrier_size

    # tick-major frame stream: tick t serves stream t%R, window t//R
    frames_flat = jnp.swapaxes(frames, 0, 1).reshape(n_in, -1)
    init_c = jnp.stack([spec.pack_init(s) for s in init_states])

    perm = [(i, (i + 1) % R) for i in range(R)]
    stage_fns = list(spec.stage_fns)
    off_f, n_f = spec.seg_frame.off, spec.seg_frame.size

    def spmd(init_c, frames_flat):
        idx = jax.lax.axis_index(axis)

        def tick(buf, t):
            prev = jax.lax.ppermute(buf, axis, perm)
            # stage 0: first R ticks ingest the bootstrapped stream
            # states; afterwards the ring wraparound IS the feedback
            # (stage 3 of window w -> stage 0 of window w+1)
            t_in = jnp.clip(t, 0, n_in - 1)
            fresh = jnp.where(
                t < R,
                jax.lax.dynamic_index_in_dim(init_c, jnp.minimum(t, R - 1),
                                             0, False),
                prev)
            fresh = jax.lax.dynamic_update_slice(
                fresh,
                jax.lax.dynamic_index_in_dim(frames_flat, t_in, 0, False),
                (off_f,))
            inp = jnp.where(idx == 0, fresh, prev)
            out = jax.lax.switch(idx, stage_fns, inp)
            emit = jnp.where(idx == N_STAGES - 1, out, jnp.zeros_like(out))
            return out, emit

        ticks = jnp.arange(n_ticks)
        _, emits = jax.lax.scan(tick, jnp.zeros((S,), jnp.float32), ticks)
        return jax.lax.psum(emits, axis)

    run = jax.jit(jax.shard_map(spmd, mesh=mesh, in_specs=(P(), P()),
                                out_specs=P(), check_vma=False))
    emits = run(init_c, frames_flat)
    ys = emits[N_STAGES - 1:]                       # (R*W, S)

    poses = jnp.stack([
        jnp.stack([spec.unpack_pose(ys[w * R + r]) for w in range(n_win)])
        for r in range(R)
    ])
    finals = [spec.unpack_state(ys[(n_win - 1) * R + r]) for r in range(R)]
    return poses, finals


def pp_ring_bytes_per_step(spec: VOPipelineSpec) -> float:
    """Modeled ICI bytes per keyframe step: each tick moves one carrier
    per device over its ring link, and one tick completes one step."""
    return float(N_STAGES * spec.carrier_size * 4)
