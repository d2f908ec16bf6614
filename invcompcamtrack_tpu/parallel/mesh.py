"""Device-mesh and sharding helpers.

The reference has no distributed backend at all — its interprocess
communication is files + ``system()`` (reference:
func_ransac_fitcameras_odom.m:94-117).  Here scale-out is first-class:

- mesh axis ``"data"``: independent work items — RANSAC hypotheses,
  image pairs, sequences.  Embarrassingly parallel; no collectives.
- mesh axis ``"model"``: the point/landmark axis *within* one problem —
  per-device partial GN Hessians / Schur blocks are ``psum``-reduced over
  this axis (the 6x6 reduction in the solver is an exact psum of
  per-point outer products).

All collectives ride inside jit-compiled programs (GSPMD or shard_map);
there is no NCCL/MPI analogue to manage.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    if n_data * n_model != n_total:
        raise ValueError(f"mesh {n_data}x{n_model} != {n_total} devices")
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, *axes: str | None) -> NamedSharding:
    """NamedSharding placing array dims on the given mesh axes
    (None = replicated dim)."""
    return NamedSharding(mesh, P(*axes))
