"""Device-stage pipeline parallelism (parallel/pipeline.py).

Validates on the virtual CPU mesh that the GPipe-style SPMD executor
(stage-per-device, ppermute ring hops, lax.switch stage dispatch)
produces exactly the sequential composition of the stages, for the VO
stage chain and for distinguishable algebraic stages (order matters).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from invcompcamtrack_tpu.parallel.pipeline import (
    pipeline_run,
    sequential_reference,
    vo_stage_fns,
)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), axis_names=("stage",))


def test_pipeline_matches_sequential_algebraic():
    """Non-commuting stages: any stage-order or routing bug shows up."""
    mesh = _mesh(4)
    stages = [
        lambda x: x + 1.0,
        lambda x: x * 2.0,
        lambda x: x - jnp.flip(x) * 0.5,
        lambda x: jnp.tanh(x) + x,
    ]
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(7, 33)),
                     jnp.float32)
    ys = pipeline_run(stages, xs, mesh)
    ref = sequential_reference(stages, xs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_vo_stage_chain():
    """The pyramid->track->triangulate->refine chain through the
    pipeline equals its sequential composition, microbatch for
    microbatch."""
    mesh = _mesh(4)
    H, W, n_pts = 24, 32, 16
    rng = np.random.default_rng(1)
    stages = vo_stage_fns((H, W), n_pts, fc=(30.0, 31.0), cc=(16.0, 12.0))

    T = 5
    bufs = []
    for _ in range(T):
        img = rng.normal(size=(H, W)) * 30 + 128
        uv = np.c_[rng.uniform(2, W - 2, n_pts), rng.uniform(2, H - 2, n_pts)]
        extra = np.zeros((n_pts, 4))
        bufs.append(np.concatenate([img.ravel(), uv.ravel(), extra.ravel()]))
    xs = jnp.asarray(np.stack(bufs), jnp.float32)

    ys = pipeline_run(stages, xs, mesh)
    ref = sequential_reference(stages, xs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    # the refine stage must actually have moved the depth channel
    S_img, S_uv = H * W, n_pts * 2
    depth = np.asarray(ys)[:, S_img + S_uv::4]
    assert np.all(depth > 0) and np.all(np.abs(depth - 8.0) < 8.0)


def test_pipeline_stage_count_mismatch():
    mesh = _mesh(4)
    with pytest.raises(ValueError):
        pipeline_run([lambda x: x] * 3, jnp.zeros((2, 8)), mesh)
