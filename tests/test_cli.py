"""End-to-end CLI tests: write the reference protocols, invoke the CLI
mains in-process, check outputs — the synthetic-GT round-trip strategy of
the reference's driver scripts (reference: run_io_test.m, run_odometer_test.m)."""

import numpy as np

from invcompcamtrack_tpu.cli import track_nposes as cli_nposes
from invcompcamtrack_tpu.cli import track_pair as cli_pair
from invcompcamtrack_tpu.utils import image as img_io
from invcompcamtrack_tpu.utils import io
from invcompcamtrack_tpu.vo import synthetic
from tests.oracles import geometry_np as geo


def _scene_setup(rng, n_frames=3):
    scene = synthetic.make_scene(rng, wh=(192, 160), fc=(180.0, 184.0))
    poses = [np.zeros(6)]
    for _ in range(n_frames - 1):
        poses.append(poses[-1] + np.r_[rng.normal(size=3) * 0.01,
                                       rng.normal(size=3) * 0.004])
    imgs = [synthetic.render(scene, geo.se3_exp(p)) for p in poses]
    X = synthetic.sample_plane_points(scene, rng, 40, margin=20)
    return scene, np.stack(poses), imgs, X


def test_track_pair_cli(rng, tmp_path):
    scene, poses, imgs, X = _scene_setup(rng, 2)
    pa = tmp_path / "a.png"
    pb = tmp_path / "b.png"
    img_io.save_gray(pa, imgs[0])
    img_io.save_gray(pb, imgs[1])
    uv, _ = geo.project(geo.se3_exp(poses[0]), X, *scene.fc, *scene.cc)
    infile = tmp_path / "in.bin"
    outfile = tmp_path / "out.bin"
    io.write_pointcam(infile, io.PointCamFile(
        pose=poses[0],  # init = reference frame pose
        fc=np.asarray(scene.fc, np.float32),
        cc=np.asarray(scene.cc, np.float32),
        wh=np.asarray(scene.wh, np.uint32),
        pt3d=X, pt2d=uv.astype(np.float32),
    ))
    rc = cli_pair.main([str(pa), str(pb), str(infile), str(outfile),
                        "2", "0", "8", "8", "0.01", "1", "0", "100", "0"])
    assert rc == 0
    p_res = io.read_pose_result(str(outfile))
    G = geo.se3_exp(p_res)
    Gg = geo.se3_exp(poses[1])
    err = np.linalg.norm(-G[:, :3].T @ G[:, 3] + Gg[:, :3].T @ Gg[:, 3])
    # PNG-quantized (uint8) images — accuracy a bit below the float path
    assert err < 5e-3, err


def test_track_pair_cli_timing_mode(rng, tmp_path, capsys):
    """verbosity==1 repeats tracking 1000x and prints the reference's
    timing line.  The printed value is ms-for-1000-runs, which the
    reference itself labels "(musec)" because it equals microseconds per
    run (reference: run_io_reprojection_test.cpp:209-231)."""
    scene, poses, imgs, X = _scene_setup(rng, 2)
    pa, pb = tmp_path / "a.png", tmp_path / "b.png"
    img_io.save_gray(pa, imgs[0])
    img_io.save_gray(pb, imgs[1])
    uv, _ = geo.project(geo.se3_exp(poses[0]), X, *scene.fc, *scene.cc)
    infile, outfile = tmp_path / "in.bin", tmp_path / "out.bin"
    io.write_pointcam(infile, io.PointCamFile(
        pose=poses[0], fc=np.asarray(scene.fc, np.float32),
        cc=np.asarray(scene.cc, np.float32),
        wh=np.asarray(scene.wh, np.uint32),
        pt3d=X, pt2d=uv.astype(np.float32),
    ))
    rc = cli_pair.main([str(pa), str(pb), str(infile), str(outfile),
                        "2", "0", "8", "2", "0.01", "1", "0", "100", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    line = [l for l in out.splitlines()
            if l.startswith("TIME (pose tracking) (musec):")]
    assert len(line) == 1
    us_per_run = float(line[0].split(":")[1])
    assert us_per_run > 0
    # sanity: 1000 runs of a tiny problem stay under 5 minutes, so the
    # per-run figure must be < 3e5 us — catches a 1000x unit slip
    assert us_per_run < 3e5
    # and the pose result file is still written in timing mode
    assert io.read_pose_result(str(outfile)).shape == (6,)


def test_track_nposes_cli(rng, tmp_path):
    scene, poses, imgs, X = _scene_setup(rng, 3)
    files = []
    for i, im in enumerate(imgs):
        f = tmp_path / f"f{i}.png"
        img_io.save_gray(f, im)
        files.append(str(f))
    uv, _ = geo.project(geo.se3_exp(poses[1]), X, *scene.fc, *scene.cc)
    # NOTE: on a *planar* scene a mildly-wrong pose hypothesis is
    # homography-self-consistent and still verifies (a real ambiguity,
    # not a bug) — so the negative control must be catastrophically off.
    p_bad = poses[1] + np.r_[0.6, -0.5, 0.3, 0.25, -0.2, 0.15]
    infile = tmp_path / "np.txt"
    outfile = tmp_path / "np_out.txt"
    io.write_nposes_input(infile, io.NPosesInput(
        params=dict(lv_f=2, lv_l=0, psz=8, maxiter=6, normdp_ratio=0.01,
                    donorm=1, dopatchnorm=0, maxpttrack=100, verbosity=0),
        fc=np.asarray(scene.fc), cc=np.asarray(scene.cc),
        wh=np.asarray(scene.wh), fb_frames=(1, 1), filenames=files,
        pt2d=uv, pt3d=X,
        poses=np.stack([poses[1], p_bad]),
        inlier_ids=[np.arange(1, 41), np.arange(1, 41)],
    ))
    rc = cli_nposes.main([str(infile), str(outfile)])
    assert rc == 0
    tracks, corrs = io.read_nposes_result(outfile, num_images=3)
    assert tracks.shape == (2, 3, 6)
    assert len(corrs) == 2 and len(corrs[0]) == 40
    # GT hypothesis scores higher than the corrupted one
    assert np.mean(corrs[0]) > np.mean(corrs[1])
    assert np.mean(corrs[0]) > 0.8
