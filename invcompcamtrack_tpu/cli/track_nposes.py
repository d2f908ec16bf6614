"""N-pose forward/backward tracker + NCC verifier CLI.

File-protocol-compatible with the reference binary
(reference: run_track_nposes.cpp:133-365; invoked by the MATLAB RANSAC
driver, func_ransac_fitcameras_odom.m:117):

    python -m invcompcamtrack_tpu.cli.track_nposes INPUT.txt OUTPUT.txt

All pose samples are verified as ONE device batch instead of the
reference's sequential sample loop.
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 2:
        print(__doc__)
        return 2

    import numpy as np
    import jax.numpy as jnp

    from invcompcamtrack_tpu.config import ICGNParams
    from invcompcamtrack_tpu.core.camera import CameraPyramid
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.solver.chain import track_nposes
    from invcompcamtrack_tpu.utils import io
    from invcompcamtrack_tpu.utils.image import load_gray

    data = io.read_nposes_input(argv[0])
    p = data.params
    cfg = ICGNParams(
        lv_f=p["lv_f"], lv_l=p["lv_l"], psz=p["psz"], maxiter=p["maxiter"],
        normdp_ratio=p["normdp_ratio"], donorm=bool(p["donorm"]),
        dopatchnorm=bool(p["dopatchnorm"]), verbosity=p["verbosity"],
    )
    cam = CameraPyramid.create(data.fc, data.cc, data.wh, cfg.num_levels, cfg.psz)
    pyramids = [
        build_pyramid(jnp.asarray(load_gray(f)), cfg.num_levels, cfg.psz)
        for f in data.filenames
    ]

    N = data.pt3d.shape[0]
    S = data.poses.shape[0]
    masks = np.zeros((S, N), bool)
    for s, ids in enumerate(data.inlier_ids):
        masks[s, np.asarray(ids) - 1] = True  # 1-based protocol ids

    res = track_nposes(
        pyramids, jnp.asarray(data.poses, jnp.float32),
        jnp.asarray(data.pt3d, jnp.float32), jnp.asarray(masks), cam, cfg,
        fb_frames=data.fb_frames,
    )

    # output: per sample, the correlations of ITS inlier points only, in
    # protocol order (reference writes nopoints = per-sample inliers)
    corr = np.asarray(res.correlations)
    corr_rows = [corr[s, np.asarray(ids) - 1] for s, ids in enumerate(data.inlier_ids)]
    io.write_nposes_result(argv[1], np.asarray(res.pose_tracks, np.float64), corr_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
