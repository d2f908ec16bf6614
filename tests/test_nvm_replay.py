"""NVM sequence replay: byte-level protocol round trip over a
multi-frame scenario (the reference's full-sequence oracle loop,
reference: run_odometer_test.m:197-244)."""

import numpy as np

from invcompcamtrack_tpu.utils import io
from invcompcamtrack_tpu.vo import replay


def test_write_read_nvm_roundtrip(rng, tmp_path):
    n_cam, n_pt = 4, 50
    quats = []
    for _ in range(n_cam):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        quats.append(q if q[0] >= 0 else -q)
    centers = rng.normal(size=(n_cam, 3))
    points = rng.normal(size=(n_pt, 3))
    focals = [500.0 + i for i in range(n_cam)]
    names = [f"im_{i}.png" for i in range(n_cam)]
    p = tmp_path / "m.nvm"
    replay.write_nvm(p, focals, quats, centers, names, points)
    model = io.read_nvm(p)
    assert model.names == names
    np.testing.assert_allclose(model.focals, focals)
    np.testing.assert_allclose(model.quats, np.stack(quats), atol=1e-9)
    np.testing.assert_allclose(model.centers, centers, atol=1e-9)
    np.testing.assert_allclose(model.points, points, atol=1e-9)


def test_normalize_model_matches_reference_formula(rng):
    pts = rng.normal(size=(100, 3)) * [2.0, 5.0, 1.0] + [3, -2, 10]
    cen = rng.normal(size=(4, 3))
    pn, cn, mm, mv = replay.normalize_model(pts, cen)
    np.testing.assert_allclose(mm, pts.mean(axis=0))
    np.testing.assert_allclose(mv, np.sqrt(pts.var(axis=0).max()))
    np.testing.assert_allclose(pn, (pts - mm) / mv)
    np.testing.assert_allclose(cn, (cen - mm) / mv)
    assert abs(pn.mean()) < 1e-12


def test_nvm_replay_tracks_sequence(rng, tmp_path):
    """Full byte-level replay: synthesize an NVM scenario on disk, track
    it through the CLI protocol, per-frame center error must stay small
    and far below the initialization error."""
    nvm_path, image_paths, fc, cc, wh = replay.make_synthetic_nvm_scenario(
        rng, tmp_path / "scn", n_frames=4, wh=(192, 160), fc=(180.0, 184.0),
        n_points=300, step=0.015,
    )
    poses, err = replay.replay_sequence(
        nvm_path, image_paths, tmp_path / "wk", fc, cc, wh,
        lv_f=2, maxiter=8, subsample=4, dopatchnorm=1,
    )
    assert poses.shape == (4, 6)
    # frame 0 is the GT anchor; subsequent frames track within the
    # normalized-unit tolerance of the reference experiment
    assert err[0] < 1e-9
    assert np.all(err[1:] < 0.01), err
