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
    """Extract the checkpointable state of a VisualOdometry engine.

    The full device state — including the keyframe pyramid stacks — is
    flattened into a flat dict, so a restored engine continues
    bit-exactly without re-feeding images."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(vo.state)[0]
    # NAME-keyed leaves: robust to VOState gaining/reordering fields
    # (a positional state_{i} format silently mis-assigns every leaf
    # after an insertion)
    out = {"state" + jax.tree_util.keystr(kp): np.asarray(x)
           for kp, x in flat}
    # level-0 keyframe image stack is (K, H+2p, W+2p): record the
    # unpadded size so restore can build a template without guessing
    pad = vo.cfg.tracker.psz
    img0 = np.asarray(vo.state.kf_pyr[0].img)
    out["img_wh_host"] = np.asarray(
        [img0.shape[2] - 2 * pad, img0.shape[1] - 2 * pad])
    out["frame_idx_host"] = np.asarray(vo._frame_idx)
    out["trajectory"] = (np.asarray(vo.trajectory) if vo.trajectory
                         else np.zeros((0, 3)))
    return out


def restore_vo_state(vo, state: Dict[str, np.ndarray]) -> None:
    """Load a checkpoint back into an engine.  The engine must be
    constructed with the same config + camera (tree structure must
    match); its ``state`` is rebuilt from the flattened leaves."""
    import jax
    import jax.numpy as jnp

    if vo.state is None:
        w, h = (int(x) for x in np.asarray(state["img_wh_host"]))
        vo.state = vo._empty_state((w, h))
    flat, treedef = jax.tree_util.tree_flatten_with_path(vo.state)
    leaves = [jnp.asarray(state["state" + jax.tree_util.keystr(kp)])
              for kp, _ in flat]
    vo.state = jax.tree.unflatten(treedef, leaves)
    vo._frame_idx = int(state["frame_idx_host"])
    vo.trajectory = [c for c in np.asarray(state["trajectory"])]
