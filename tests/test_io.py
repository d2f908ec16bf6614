import numpy as np
import pytest

from invcompcamtrack_tpu.utils import io


def test_flo_roundtrip(rng, tmp_path):
    flow = rng.normal(size=(17, 23, 2)).astype(np.float32)
    p = tmp_path / "x.flo"
    io.write_flo(p, flow)
    out = io.read_flo(p)
    np.testing.assert_array_equal(out, flow)


def test_flo_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 32)
    with pytest.raises(ValueError):
        io.read_flo(p)


def test_pfm_roundtrip(rng, tmp_path):
    img = rng.normal(size=(11, 13)).astype(np.float32)
    p = tmp_path / "x.pfm"
    io.write_pfm(p, img)
    out = io.read_pfm(p)
    np.testing.assert_array_equal(out, img)


def test_pointcam_roundtrip(rng, tmp_path):
    data = io.PointCamFile(
        pose=rng.normal(size=6),
        fc=np.array([1000.0, 1200.0], np.float32),
        cc=np.array([660.0, 390.0], np.float32),
        wh=np.array([1280, 720], np.uint32),
        pt3d=rng.normal(size=(50, 3)),
        pt2d=rng.normal(size=(50, 2)).astype(np.float32),
    )
    p = tmp_path / "cam.bin"
    io.write_pointcam(p, data)
    out = io.read_pointcam(p)
    np.testing.assert_allclose(out.pose, data.pose)
    np.testing.assert_array_equal(out.fc, data.fc)
    np.testing.assert_array_equal(out.wh, data.wh)
    np.testing.assert_allclose(out.pt3d, data.pt3d)
    np.testing.assert_allclose(out.pt2d, data.pt2d)


def test_pose_result_roundtrip(rng, tmp_path):
    pose = rng.normal(size=6)
    p = tmp_path / "pose.bin"
    io.write_pose_result(str(p), pose)
    np.testing.assert_array_equal(io.read_pose_result(str(p)), pose)


def test_nposes_protocol_roundtrip(rng, tmp_path):
    data = io.NPosesInput(
        params=dict(lv_f=4, lv_l=0, psz=8, maxiter=10, normdp_ratio=0.01,
                    donorm=1, dopatchnorm=0, maxpttrack=100, verbosity=0),
        fc=np.array([500.0, 510.0]),
        cc=np.array([320.0, 240.0]),
        wh=np.array([640, 480]),
        fb_frames=(2, 1),
        filenames=["a.png", "b.png", "c.png", "d.png"],
        pt2d=rng.normal(size=(7, 2)),
        pt3d=rng.normal(size=(7, 3)),
        poses=rng.normal(size=(3, 6)),
        inlier_ids=[np.array([1, 3, 5]), np.array([2, 4]), np.array([1, 2, 3, 4])],
    )
    p = tmp_path / "nposes.txt"
    io.write_nposes_input(p, data)
    out = io.read_nposes_input(p)
    assert out.params == data.params
    assert out.fb_frames == data.fb_frames
    assert out.filenames == data.filenames
    np.testing.assert_allclose(out.pt2d, data.pt2d)
    np.testing.assert_allclose(out.pt3d, data.pt3d)
    np.testing.assert_allclose(out.poses, data.poses)
    for a, b in zip(out.inlier_ids, data.inlier_ids):
        np.testing.assert_array_equal(a, b)


def test_nposes_result_roundtrip(rng, tmp_path):
    tracks = rng.normal(size=(2, 4, 6))
    corrs = [rng.uniform(size=5), rng.uniform(size=3)]
    p = tmp_path / "res.txt"
    io.write_nposes_result(p, tracks, corrs)
    t2, c2 = io.read_nposes_result(p, num_images=4)
    np.testing.assert_allclose(t2, tracks, rtol=1e-6)
    for a, b in zip(c2, corrs):
        np.testing.assert_allclose(a, b, rtol=1e-2)


def test_nvm_parser(tmp_path):
    nvm = """NVM_V3
2
img0.jpg 800.0 1 0 0 0 1.0 2.0 3.0 0.0 0
img1.jpg 810.0 0.999 0.01 0 0 1.5 2.0 3.0 0.0 0
2
0.5 0.6 0.7 255 0 0 2 0 0 10.5 20.5 1 0 30.5 40.5
1.5 1.6 1.7 0 255 0 1 0 1 -5.0 6.0
0
"""
    p = tmp_path / "m.nvm"
    p.write_text(nvm)
    model = io.read_nvm(p)
    assert model.names == ["img0.jpg", "img1.jpg"]
    np.testing.assert_allclose(model.focals, [800.0, 810.0])
    np.testing.assert_allclose(model.centers[0], [1.0, 2.0, 3.0])
    assert model.points.shape == (2, 3)
    assert model.measurements[0].shape == (2, 4)
    np.testing.assert_allclose(model.measurements[0][0], [0, 0, 10.5, 20.5])


def test_track_archive_roundtrip(rng, tmp_path):
    xy = rng.normal(size=(16, 4, 2)).astype(np.float32)
    alive = rng.uniform(size=16) > 0.5
    p = tmp_path / "tracks.npz"
    io.save_tracks(p, xy, alive)
    x2, a2 = io.load_tracks(p)
    np.testing.assert_array_equal(x2, xy)
    np.testing.assert_array_equal(a2, alive)
