"""Checkpoint / resume for streaming VO state.

The reference persists tracker state only as npz archives and tiny
binary pose files (reference: classoftrack.py:133-134, SURVEY.md §5
"checkpoint/resume: none for the tracker").  For a long-running
production engine the window state (keyframe poses, landmark table,
observation grid, track tables) checkpoints per keyframe via orbax when
available, with an npz fallback.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict

import numpy as np


def _to_numpy_tree(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in tree.items()}


def save_checkpoint(path, tree: Dict[str, Any]) -> None:
    """Atomic save of a flat dict of arrays (orbax if importable,
    npz otherwise — format chosen by extension handling in restore)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path.with_suffix(".orbax"), _to_numpy_tree(tree), force=True)
    except Exception:
        tmp = path.with_suffix(".npz.tmp")
        np.savez_compressed(tmp, **_to_numpy_tree(tree))
        tmp.rename(path.with_suffix(".npz"))
        # drop any stale orbax checkpoint so restore cannot silently
        # prefer an older state over this newer npz fallback
        orbax_path = path.with_suffix(".orbax")
        if orbax_path.exists():
            import shutil

            shutil.rmtree(orbax_path, ignore_errors=True)


def restore_checkpoint(path) -> Dict[str, np.ndarray]:
    path = pathlib.Path(path)
    orbax_path = path.with_suffix(".orbax")
    if orbax_path.exists():
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return {k: np.asarray(v) for k, v in ckptr.restore(orbax_path).items()}
    npz = np.load(path.with_suffix(".npz"))
    return {k: npz[k] for k in npz.files}


def vo_state_dict(vo) -> Dict[str, Any]:
    """Extract the checkpointable state of a VisualOdometry engine."""
    return {
        "landmarks": vo.landmarks,
        "lm_valid": vo.lm_valid,
        "kf_poses": vo.kf_poses,
        "kf_valid": np.asarray(vo.kf_valid),
        "kf_obs": vo.kf_obs,
        "kf_obs_mask": vo.kf_obs_mask,
        "cur_pose": vo.cur_pose,
        "frame_idx": np.asarray(vo.frame_idx),
        "trajectory": np.asarray(vo.trajectory) if vo.trajectory
        else np.zeros((0, 3)),
        "last_kf_slot": np.asarray(
            -1 if vo._last_kf_slot is None else vo._last_kf_slot
        ),
    }


def restore_vo_state(vo, state: Dict[str, np.ndarray]) -> None:
    """Load a checkpoint back into an engine (pyramids are NOT part of
    the checkpoint — the caller re-feeds the current keyframe images)."""
    import jax.numpy as jnp

    vo.landmarks = jnp.asarray(state["landmarks"])
    vo.lm_valid = jnp.asarray(state["lm_valid"])
    vo.kf_poses = jnp.asarray(state["kf_poses"])
    vo.kf_valid = np.asarray(state["kf_valid"])
    vo.kf_obs = jnp.asarray(state["kf_obs"])
    vo.kf_obs_mask = jnp.asarray(state["kf_obs_mask"])
    vo.cur_pose = jnp.asarray(state["cur_pose"])
    vo.frame_idx = int(state["frame_idx"])
    vo.trajectory = [c for c in np.asarray(state["trajectory"])]
    slot = int(state["last_kf_slot"])
    vo._last_kf_slot = None if slot < 0 else slot
