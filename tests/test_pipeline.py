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


def test_vo_real_chain_pipeline_matches_sequential_engine(rng):
    """THE real-chain PP test: four independent VO streams round-robined
    through the 4-stage ring (pyramid+track / re-observe / triangulate /
    BA+commit — the engine's own sub-stage functions) must reproduce
    each stream's sequential ``VisualOdometry`` trajectory and final
    landmark map.  Tolerance is float32 re-fusion noise only: the stages
    compute the same ops on the same values."""
    from invcompcamtrack_tpu.config import ICGNParams
    from invcompcamtrack_tpu.core.camera import CameraPyramid
    from invcompcamtrack_tpu.parallel.vo_pipeline import (
        make_vo_pipeline, pp_ring_bytes_per_step, vo_pipeline_run)
    from invcompcamtrack_tpu.vo import synthetic
    from invcompcamtrack_tpu.vo.engine import VisualOdometry, VOConfig
    from tests.oracles import geometry_np as geo

    mesh = _mesh(4)
    wh = (128, 96)
    n_win = 4          # keyframe steps per stream after bootstrap
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cfg = VOConfig(tracker=tracker, max_landmarks=64, window=3,
                   keyframe_stride=1, corners_per_kf=64,
                   min_parallax_px=0.5)
    scene = synthetic.make_scene(rng, wh=wh, fc=(110.0, 112.0))
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)

    # four streams: same scene, four distinct camera paths
    streams = []
    for r in range(4):
        rr = np.random.default_rng(100 + r)
        poses = [np.zeros(6)]
        for _ in range(1, n_win + 2):
            poses.append(poses[-1] + np.r_[rr.normal(size=3) * 0.015,
                                           rr.normal(size=3) * 0.004])
        poses = np.stack(poses)
        imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses]
        streams.append((poses, imgs))

    # sequential oracle: each stream through the ordinary engine
    seq_poses, init_states, frames = [], [], []
    for r, (poses_gt, imgs) in enumerate(streams):
        vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
        seeds = synthetic.sample_plane_points(
            scene, np.random.default_rng(7), 60, margin=16)
        vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
        init_states.append(vo.state)
        frames.append(np.stack(imgs[2:2 + n_win]))
        seq_poses.append(np.stack(
            [vo.process_frame(imgs[2 + w]) for w in range(n_win)]))
    seq_poses = np.stack(seq_poses)
    seq_final_lms = np.asarray(vo.landmarks)      # stream 3's final map
    seq_final_valid = np.asarray(vo.lm_valid)

    spec = make_vo_pipeline(cam, cfg, wh)
    pp_poses, finals = vo_pipeline_run(
        spec, init_states, np.stack(frames), mesh)

    np.testing.assert_allclose(np.asarray(pp_poses), seq_poses, atol=2e-5)
    # stream 3's final state: landmark table parity
    np.testing.assert_allclose(np.asarray(finals[3].landmarks),
                               seq_final_lms, atol=2e-4)
    assert np.array_equal(np.asarray(finals[3].lm_valid), seq_final_valid)
    assert pp_ring_bytes_per_step(spec) > 0

    # slim-carrier round trip: the default spec ships kf FRAMES and
    # rebuilds pyramids at unpack; strip+rebuild must be IDENTITY on a
    # real bootstrapped state (pyramids are deterministic functions of
    # their level-0 interiors), and the carrier must be materially
    # smaller than the pyramids-on-the-ring layout
    spec_fat = make_vo_pipeline(cam, cfg, wh, slim_carrier=False)
    assert spec.carrier_size < 0.55 * spec_fat.carrier_size
    st = init_states[0]
    rt = spec.unpack_state(spec.pack_init(st))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(rt)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
