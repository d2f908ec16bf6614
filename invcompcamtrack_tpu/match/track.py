"""Flow-transfer point tracking with forward/backward verification.

TPU re-design of the reference's ``oftrack`` class
(reference: misc_src/classoftrack.py:37-130).  The reference keeps a
python list of per-start-frame numpy batches, compacts dead tracks by
fancy-indexing, and flags invalid positions with NaN.  Here the track
store is a **fixed-capacity masked table** — a pytree of fixed-shape
arrays — so the whole per-frame update is one jitted program:

- ``transfer_points``: bilinear interpolation of a dense flow field at
  track heads with out-of-bounds invalidation
  (reference: classoftrack.py:4-34),
- forward/backward consistency gate: BOTH the error/displacement ratio
  (< 0.2) and the absolute error (< 1 px) must hold
  (reference: classoftrack.py:85-93),
- dead tracks are *recycled in place* instead of compacted: new corners
  claim free slots via a prefix-sum slot assignment (the fixed-shape
  equivalent of classoftrack.py:96-100's compaction).

A track's history lives in a ring window of ``W`` recent positions
(the reference's ``bsize``), with NaNs marking pre-birth entries.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def transfer_points(xy: jnp.ndarray, flow: jnp.ndarray):
    """Transfer points by a dense flow field.

    xy: (N, 2); flow: (H, W, 2).  Returns (xy_new (N, 2), valid (N,)).
    Matches the reference's validity rule: floor AND ceil of both coords
    must be inside the field (reference: classoftrack.py:13), invalid
    results are NaN there / masked here (both returned for parity).
    """
    H, W = flow.shape[0], flow.shape[1]
    xf = jnp.floor(xy)
    f = xy - xf
    x0 = xf[:, 0].astype(jnp.int32)
    y0 = xf[:, 1].astype(jnp.int32)
    valid = (
        (x0 >= 0) & (x0 + 1 < W) & (y0 >= 0) & (y0 + 1 < H)
        & jnp.all(jnp.isfinite(xy), axis=1)
    )
    x0c = jnp.clip(x0, 0, W - 2)
    y0c = jnp.clip(y0, 0, H - 2)
    w00 = f[:, 0] * f[:, 1]          # flow[y0+1, x0+1]
    w01 = (1 - f[:, 0]) * f[:, 1]    # flow[y0+1, x0]
    w10 = f[:, 0] * (1 - f[:, 1])    # flow[y0,   x0+1]
    w11 = (1 - f[:, 0]) * (1 - f[:, 1])
    flat = flow.reshape(-1, 2)

    def tap(yy, xx):
        return jnp.take(flat, yy * W + xx, axis=0)

    d = (
        w00[:, None] * tap(y0c + 1, x0c + 1)
        + w01[:, None] * tap(y0c + 1, x0c)
        + w10[:, None] * tap(y0c, x0c + 1)
        + w11[:, None] * tap(y0c, x0c)
    )
    xy_new = jnp.where(valid[:, None], xy + d, jnp.nan)
    return xy_new, valid


class TrackTable(NamedTuple):
    """Fixed-capacity track store (capacity C, history window W)."""

    xy: jnp.ndarray        # (C, W, 2) ring buffer of positions; slot
                           # `head` is the current frame's position
    alive: jnp.ndarray     # (C,) bool
    age: jnp.ndarray       # (C,) int32 frames since birth
    total_move: jnp.ndarray  # (C,) |first - current| (classoftrack.py:92)
    birth_xy: jnp.ndarray  # (C, 2) position at track start
    head: jnp.ndarray      # () int32, ring index of the current frame
    frame: jnp.ndarray     # () int32, global frame counter


def make_track_table(capacity: int, window: int) -> TrackTable:
    return TrackTable(
        xy=jnp.full((capacity, window, 2), jnp.nan, jnp.float32),
        alive=jnp.zeros(capacity, bool),
        age=jnp.zeros(capacity, jnp.int32),
        total_move=jnp.zeros(capacity, jnp.float32),
        birth_xy=jnp.full((capacity, 2), jnp.nan, jnp.float32),
        head=jnp.zeros((), jnp.int32),
        frame=jnp.zeros((), jnp.int32),
    )


def advance_tracks(state: TrackTable, flow_f: jnp.ndarray, flow_b: jnp.ndarray,
                   new_xy: jnp.ndarray, new_valid: jnp.ndarray,
                   ratio_th: float = 0.2, abs_th: float = 1.0) -> TrackTable:
    """One frame step: transfer live tracks through (flow_f, flow_b) with
    the fwd/bwd gate, then seed new tracks into free slots.

    new_xy: (K, 2) candidate corners for this frame; new_valid: (K,).
    All shapes static; fully jittable.
    """
    C, W, _ = state.xy.shape
    cur = state.xy[:, state.head % W, :]

    xy_f, ok_f = transfer_points(cur, flow_f)
    xy_fb, ok_b = transfer_points(xy_f, flow_b)
    err = jnp.linalg.norm(cur - xy_fb, axis=1)
    disp = jnp.linalg.norm(cur - xy_f, axis=1)
    gate = (err / jnp.maximum(disp, 1e-12) < ratio_th) & (err < abs_th)
    alive = state.alive & ok_f & ok_b & gate

    new_head = (state.head + 1) % W
    xy = state.xy.at[:, new_head, :].set(
        jnp.where(alive[:, None], xy_f, jnp.nan).astype(state.xy.dtype)
    )
    total_move = jnp.where(
        alive, jnp.linalg.norm(state.birth_xy - xy_f, axis=1), state.total_move
    )

    # recycle dead slots with new corners: k-th valid corner -> k-th free slot
    free = ~alive
    slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1      # rank among free slots
    cand_rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1  # rank among candidates
    K = new_xy.shape[0]
    # cand_for_rank[r] = index of the candidate with rank r (scatter;
    # invalid candidates and ranks >= C fall out of bounds and are dropped)
    cand_for_rank = jnp.full((C,), -1, jnp.int32)
    scatter_idx = jnp.where(new_valid, cand_rank, C)
    cand_for_rank = cand_for_rank.at[scatter_idx].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop"
    )
    take = cand_for_rank[jnp.clip(slot_rank, 0, C - 1)]
    seeds = free & (take >= 0)
    seed_xy = jnp.take(new_xy, jnp.clip(take, 0, K - 1), axis=0)

    # seeded slots: wipe history to NaN, then place the seed at the head
    nan = jnp.asarray(jnp.nan, xy.dtype)
    seed_xy = seed_xy.astype(xy.dtype)
    xy = jnp.where(seeds[:, None, None], nan, xy)
    xy = xy.at[:, new_head, :].set(
        jnp.where(seeds[:, None], seed_xy, xy[:, new_head, :])
    )

    return TrackTable(
        xy=xy,
        alive=alive | seeds,
        age=jnp.where(seeds, 0, jnp.where(alive, state.age + 1, state.age)),
        total_move=jnp.where(seeds, 0.0, total_move).astype(state.total_move.dtype),
        birth_xy=jnp.where(seeds[:, None], seed_xy, state.birth_xy),
        head=new_head,
        frame=state.frame + 1,
    )


def point_pairs(state: TrackTable, min_move: float = -1.0):
    """(prev, cur) positions of tracks alive across the last step —
    the reference's ``getpttransfer`` (classoftrack.py:103-130).

    Returns (pairs (C, 2, 2), valid (C,)) — fixed-shape + mask instead of
    a compacted list.
    """
    W = state.xy.shape[1]
    cur = state.xy[:, state.head % W, :]
    prev = state.xy[:, (state.head - 1) % W, :]
    valid = (
        state.alive
        & (state.age >= 1)
        & jnp.all(jnp.isfinite(prev), axis=1)
        & (state.total_move > min_move)
    )
    return jnp.stack([prev, cur], axis=1), valid
