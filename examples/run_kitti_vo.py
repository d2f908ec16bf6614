"""Example: monocular VO on a KITTI odometry sequence (BASELINE config 4).

    python examples/run_kitti_vo.py /path/to/kitti_odometry 00 --frames 200

With a real dataset: reads sequences/NN via vo.datasets, bootstraps from
the first two frames (essential matrix; monocular scale fixed from the
GT baseline when poses are available, else unit), runs the engine, and
prints scale-aligned ATE-RMSE against the GT trajectory.

Without arguments it falls back to a synthetic sequence so the pipeline
always runs end-to-end.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.utils.image import load_gray
from invcompcamtrack_tpu.utils.metrics import MetricsLogger
from invcompcamtrack_tpu.vo.engine import VisualOdometry, VOConfig
from invcompcamtrack_tpu.vo.metrics import ate_rmse, rpe_trans


def run_sequence(frames, fc, cc, wh, centers_gt=None, scale=1.0,
                 log_path=None):
    tracker = ICGNParams(lv_f=3, lv_l=0, psz=8, maxiter=8)
    cfg = VOConfig(tracker=tracker, max_landmarks=512, window=5,
                   keyframe_stride=2, corners_per_kf=512, min_parallax_px=0.5)
    cam = CameraPyramid.create(fc, cc, wh, tracker.num_levels, tracker.psz)
    vo = VisualOdometry(cam, fc, cc, cfg)
    metrics = MetricsLogger(log_path)

    n_seeds = vo.bootstrap_from_images(frames[0], frames[1], scale=scale)
    print(f"bootstrap: {n_seeds} landmark seeds")
    t_prev = time.perf_counter()
    for i in range(2, len(frames)):
        vo.process_frame(frames[i])
        now = time.perf_counter()
        metrics.record(frame=i, landmarks=int(vo.lm_valid.sum()),
                       step_ms=round((now - t_prev) * 1e3, 1))
        t_prev = now

    traj = np.stack(vo.trajectory)
    if centers_gt is not None:
        gt = centers_gt[: len(traj)]
        ate = float(ate_rmse(jnp.asarray(traj), jnp.asarray(gt), with_scale=True))
        rpe = float(rpe_trans(jnp.asarray(traj), jnp.asarray(gt)))
        extent = float(np.linalg.norm(gt - gt.mean(0), axis=1).max())
        print(f"frames {len(traj)} | ATE-RMSE {ate:.4f} "
              f"({100 * ate / max(extent, 1e-9):.2f}% of extent {extent:.2f}) "
              f"| RPE {rpe:.4f}")
    s = metrics.summary("step_ms")
    if s:
        print(f"step time ms: mean {s['mean']:.1f} (min {s['min']:.1f}, "
              f"max {s['max']:.1f})")
    return traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default=None)
    ap.add_argument("sequence", nargs="?", default="00")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    if args.root:
        from invcompcamtrack_tpu.vo.datasets import kitti_gt_centers, load_kitti_sequence

        seq = load_kitti_sequence(args.root, args.sequence)
        frames = [load_gray(p) for p in seq.image_paths[: args.frames]]
        wh = (frames[0].shape[1], frames[0].shape[0])
        centers = kitti_gt_centers(seq.poses_gt) if seq.poses_gt is not None else None
        scale = 1.0
        if centers is not None:
            scale = float(np.linalg.norm(centers[1] - centers[0]))
        run_sequence(frames, seq.fc, seq.cc, wh, centers, scale, args.log)
    else:
        print("no dataset given — running the synthetic fallback sequence")
        from invcompcamtrack_tpu.vo import synthetic

        rng = np.random.default_rng(0)
        scene = synthetic.make_scene(rng, wh=(320, 240), fc=(300.0, 302.0),
                                     freq_range=(0.8, 8.0))
        exp = lambda p: np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)),
                                   np.float64)
        poses = [np.zeros(6)]
        for i in range(1, min(args.frames, 20)):
            poses.append(poses[-1] + np.r_[0.015, 0.006, -0.02,
                                           rng.normal(size=3) * 0.001])
        frames = [synthetic.render(scene, exp(p)) for p in poses]
        centers = np.stack([-exp(p)[:, :3].T @ exp(p)[:, 3] for p in poses])
        scale = float(np.linalg.norm(centers[1] - centers[0]))
        run_sequence(frames, scene.fc, scene.cc, scene.wh, centers, scale,
                     args.log)


if __name__ == "__main__":
    sys.exit(main())
