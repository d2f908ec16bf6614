"""Example: the stereo+flow tracking chain (the reference's KITTI stereo
workload, reference: run_test_OF_track.py): per frame —
LK stereo matching -> disparity triangulation -> temporal LK tracks with
4-way consistency -> F-matrix RANSAC static/dynamic split -> PnP pose.

Runs on a synthetic rectified stereo sequence; prints per-frame pose
error vs GT.  Usage: python examples/run_stereo_track.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match.features import shi_tomasi_corners
from invcompcamtrack_tpu.match.lk import track_points_lk
from invcompcamtrack_tpu.sfm.epipolar import fit_fundamental_ransac
from invcompcamtrack_tpu.sfm.ransac import reprojection_errors
from invcompcamtrack_tpu.sfm.stereo import disparity_to_points, stereo_flow_consistency
from invcompcamtrack_tpu.vo import synthetic


def main():
    rng = np.random.default_rng(0)
    W, H = 320, 240
    scene = synthetic.make_scene(rng, wh=(W, H), fc=(300.0, 300.0), z0=8.0,
                             freq_range=(0.5, 6.0))
    fc, cc = scene.fc, scene.cc
    baseline = 0.3

    def exp(p):
        return np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)), np.float64)

    def render_pair(p):
        G_l = exp(p)
        # right camera: shifted by baseline along the rig x-axis
        R = G_l[:, :3]
        c_l = -R.T @ G_l[:, 3]
        c_r = c_l + R.T @ np.array([baseline, 0, 0])
        G_r = np.concatenate([R, (-R @ c_r)[:, None]], axis=1)
        return synthetic.render(scene, G_l), synthetic.render(scene, G_r)

    n_frames = 5
    poses_gt = [np.zeros(6)]
    for i in range(1, n_frames):
        poses_gt.append(poses_gt[-1] + np.r_[0.01, 0.004, 0.004,
                                             rng.normal(size=3) * 0.002])

    L, pad = 3, 8
    pyrs = []
    for p in poses_gt:
        il, ir = render_pair(p)
        pyrs.append((build_pyramid(jnp.asarray(il, jnp.float32), L, pad),
                     build_pyramid(jnp.asarray(ir, jnp.float32), L, pad)))

    lk = jax.jit(lambda a, b, x: track_points_lk(a, b, x, psz=8, padding=pad))

    for t in range(n_frames - 1):
        pl_t, pr_t = pyrs[t]
        pl_n, pr_n = pyrs[t + 1]
        xy_l0, cval = shi_tomasi_corners(pl_t[0].img[pad:-pad, pad:-pad],
                                         max_corners=256, border=16)
        # stereo match: seed with the nominal disparity at scene depth
        nominal_disp = fc[0] * baseline / 8.0
        seed = xy_l0 - jnp.asarray([nominal_disp, 0.0], jnp.float32)
        xy_r0, ok_s = track_points_lk(pl_t, pr_t, xy_l0, psz=8, padding=pad,
                                      init_xy=seed)
        xy_l1, ok_t = lk(pl_t, pl_n, xy_l0)           # temporal left
        xy_r1, ok_r = lk(pr_t, pr_n, xy_r0)           # temporal right
        cons = stereo_flow_consistency(xy_l0, xy_r0, xy_l1, xy_r1)
        good = np.asarray(cval & ok_s & ok_t & ok_r & cons)

        # static/dynamic split via F-RANSAC on the temporal left pairs
        fres = fit_fundamental_ransac(jax.random.PRNGKey(t),
                                      xy_l0, xy_l1, n_samples=128, thresh=1.5)
        good = good & np.asarray(fres.inliers)

        disp = np.asarray(xy_l0[:, 0] - xy_r0[:, 0])
        X_t = disparity_to_points(xy_l0, jnp.asarray(disp), fc[0], fc[1],
                                  cc[0], cc[1], baseline)
        # X_t is in frame-t camera coords; lift to world with GT pose t
        # (the reference chains PnP incrementally the same way)
        G_t = exp(poses_gt[t])
        Xw = (np.asarray(X_t) - G_t[:, 3]) @ G_t[:, :3]

        good = good & np.all(np.isfinite(Xw), axis=1) & (disp > 1.0)
        idx = np.where(good)[0]
        if len(idx) < 10:
            print(f"frame {t+1}: too few consistent tracks ({len(idx)})")
            continue
        from invcompcamtrack_tpu.sfm.ransac import fit_camera_ransac

        res = fit_camera_ransac(
            jax.random.PRNGKey(100 + t),
            jnp.asarray(np.asarray(xy_l1)[idx], jnp.float32),
            jnp.asarray(Xw[idx], jnp.float32), fc, cc,
            n_samples=128, inl_thresh=2.0,
        )
        best = int(jnp.argmax(jnp.where(res.valid, res.num_inliers, -1)))
        G_est = np.asarray(res.G[best])
        idx = idx[np.asarray(res.inliers[best])]
        G_gt = exp(poses_gt[t + 1])
        c_est = -G_est[:, :3].T @ G_est[:, 3]
        c_gt = -G_gt[:, :3].T @ G_gt[:, 3]
        err = reprojection_errors(jnp.asarray(G_est), jnp.asarray(Xw[idx]),
                                  jnp.asarray(np.asarray(xy_l1)[idx]),
                                  jnp.asarray(fc), jnp.asarray(cc))
        print(f"frame {t+1}: tracks {len(idx):3d} | center err "
              f"{np.linalg.norm(c_est - c_gt):.4f} | mean reproj "
              f"{float(jnp.mean(err)):.2f} px")


if __name__ == "__main__":
    sys.exit(main())
