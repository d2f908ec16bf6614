import io as std_io
import contextlib

import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.utils import checkpoint as ckpt
from invcompcamtrack_tpu.utils.metrics import MetricsLogger
from invcompcamtrack_tpu.vo import synthetic
from invcompcamtrack_tpu.vo.engine import VisualOdometry, VOConfig
from invcompcamtrack_tpu.vo.horizon import estimate_orientation, horizon_loss
from tests.oracles import geometry_np as geo


def test_metrics_logger(tmp_path):
    path = tmp_path / "m.jsonl"
    m = MetricsLogger(str(path))
    m.record(frame=0, iters=5, fps=12.5)
    m.record(frame=1, iters=7, fps=13.5)
    m.close()
    assert m.summary("fps")["mean"] == 13.0
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2 and '"iters": 5' in lines[0]


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {
        "a": rng.normal(size=(4, 6)).astype(np.float32),
        "b": np.arange(5),
        "flag": np.asarray(True),
    }
    p = tmp_path / "state"
    ckpt.save_checkpoint(p, tree)
    out = ckpt.restore_checkpoint(p)
    for k in tree:
        np.testing.assert_array_equal(out[k], np.asarray(tree[k]))


def test_vo_checkpoint_resume(tmp_path, rng):
    """Checkpoint mid-sequence, restore into a fresh engine, continue:
    the trajectory must continue consistently."""
    scene = synthetic.make_scene(rng, wh=(192, 144), fc=(170.0, 172.0))
    poses_gt = [np.zeros(6)]
    for i in range(1, 9):
        poses_gt.append(poses_gt[-1] + np.r_[0.008, 0.002, 0.003,
                                             rng.normal(size=3) * 0.001])
    imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses_gt]
    tracker = ICGNParams(lv_f=2, lv_l=0, psz=8, maxiter=6)
    cfg = VOConfig(tracker=tracker, max_landmarks=128, window=3,
                   keyframe_stride=2, corners_per_kf=128)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh,
                               tracker.num_levels, tracker.psz)

    vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
    seeds = synthetic.sample_plane_points(scene, rng, 100, margin=20)
    vo.bootstrap(imgs[0], imgs[1], poses_gt[0], poses_gt[1], seeds)
    for i in range(2, 5):
        vo.process_frame(imgs[i])

    ckpt.save_checkpoint(tmp_path / "vo", ckpt.vo_state_dict(vo))

    vo2 = VisualOdometry(cam, scene.fc, scene.cc, cfg)
    ckpt.restore_vo_state(vo2, ckpt.restore_checkpoint(tmp_path / "vo"))
    # the full device state (incl. keyframe pyramid stacks) round-trips

    for i in range(5, 9):
        a = vo.process_frame(imgs[i])
        b = vo2.process_frame(imgs[i])
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_solver_verbosity_prints(rng, capfd):
    import jax

    scene = synthetic.make_scene(rng, wh=(128, 96), fc=(120.0, 122.0))
    img0 = synthetic.render(scene, geo.se3_exp(np.zeros(6)))
    img1 = synthetic.render(scene, geo.se3_exp(np.r_[0.005, 0, 0, 0, 0, 0]))
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.solver.icgn import track_pose

    cfg = ICGNParams(lv_f=1, lv_l=0, psz=8, maxiter=3, verbosity=2)
    cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, cfg.num_levels, cfg.psz)
    pa = build_pyramid(jnp.asarray(img0), cfg.num_levels, cfg.psz)
    pb = build_pyramid(jnp.asarray(img1), cfg.num_levels, cfg.psz)
    X = synthetic.sample_plane_points(scene, rng, 24, margin=16)
    out = track_pose(pa, pb, jnp.asarray(X), jnp.zeros(6), cam, cfg)
    jax.block_until_ready(out)
    jax.effects_barrier()
    captured = capfd.readouterr()
    assert "Sc01,It00:" in captured.out or "Sc01,It00:" in captured.err


def test_horizon_orientation_recovers_tilt(rng):
    """Synthetic sky/ground image with known camera roll+pitch: the
    horizon optimizer must reduce the loss and move toward GT."""
    H, W = 120, 160
    fc, cc = (100.0, 100.0), (80.0, 60.0)
    w_gt = np.array([0.06, 0.0, -0.08])  # pitch + roll
    R = geo.se3_exp(np.r_[np.zeros(3), w_gt])[:, :3]
    # render: pixel ray r = R^T K^-1 [u,v,1]; sky where up-component > 0
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    d = np.stack([(uu - cc[0]) / fc[0], (vv - cc[1]) / fc[1], np.ones_like(uu)], -1)
    d_world = d @ R  # R^T d
    img = np.where(d_world[..., 1] < 0, 200.0, 40.0)  # up = +y; y<0 is sky
    img += rng.normal(size=img.shape) * 2.0

    w0 = jnp.zeros(3)
    l0 = float(horizon_loss(w0, jnp.asarray(img), fc, cc))
    l_gt = float(horizon_loss(jnp.asarray(w_gt), jnp.asarray(img), fc, cc))
    assert l_gt < l0  # GT orientation has higher contrast (lower loss)

    w_est, l_est = estimate_orientation(jnp.asarray(img), fc, cc,
                                        num_iters=150, lr=2e-3)
    assert float(l_est) < l0
    # moved meaningfully toward the GT tilt
    err0 = np.linalg.norm(w_gt)
    err = np.linalg.norm(np.asarray(w_est) - w_gt)
    assert err < err0 * 0.6, (err, err0)


def test_checkpointed_loop_resumes(tmp_path, rng):
    from invcompcamtrack_tpu.parallel.runtime import checkpointed_loop

    calls = []

    def step(state, i):
        calls.append(i)
        return {**state, "x": state["x"] + 1.0}

    st = {"x": np.asarray(0.0)}
    out = checkpointed_loop(step, st, num_steps=7, ckpt_path=tmp_path / "ck",
                            every=3)
    assert float(out["x"]) == 7.0
    # simulate a crash + restart: resumes from the last checkpoint, not 0
    calls.clear()
    out2 = checkpointed_loop(step, {"x": np.asarray(0.0)}, num_steps=7,
                             ckpt_path=tmp_path / "ck", every=3)
    assert calls == []  # step 7 checkpoint covers all steps
    assert float(out2["x"]) == 7.0
    # partial progress: wipe, run 4 steps by checkpointing every 2 then crash
    out3 = checkpointed_loop(step, {"x": np.asarray(0.0)}, num_steps=4,
                             ckpt_path=tmp_path / "ck2", every=2)
    calls.clear()
    out4 = checkpointed_loop(step, {"x": np.asarray(0.0)}, num_steps=9,
                             ckpt_path=tmp_path / "ck2", every=2)
    assert calls == [4, 5, 6, 7, 8]
    assert float(out4["x"]) == 9.0


def test_initialize_distributed_single_process():
    from invcompcamtrack_tpu.parallel.runtime import initialize_distributed

    assert initialize_distributed() is False  # no-op single process
