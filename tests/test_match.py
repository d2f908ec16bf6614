import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match import ncc, track
from invcompcamtrack_tpu.match.features import shi_tomasi_corners
from invcompcamtrack_tpu.match.lk import lk_forward_backward, track_points_lk
from invcompcamtrack_tpu.vo import synthetic
from tests.oracles import geometry_np as geo


# ---------- NCC ----------

def test_ncc_score_identical_patches_is_one(rng):
    p = jnp.asarray(rng.normal(size=(5, 8, 8)))
    p = p - p.mean(axis=(1, 2), keepdims=True)
    s = np.asarray(ncc.ncc_score(p, p))
    np.testing.assert_allclose(s, 1.0, atol=1e-12)


def test_ncc_score_clamps_negative(rng):
    p = jnp.asarray(rng.normal(size=(8, 8)))
    s = float(ncc.ncc_score(p, -p))
    assert s == 0.0


def test_patch_correlation_score_weighting(rng):
    p = jnp.asarray(rng.normal(size=(8, 8)))
    q = jnp.asarray(rng.normal(size=(8, 8)))
    t = jnp.asarray(True)
    f = jnp.asarray(False)
    # both sides valid, fb=(2,3): weights 4 and 9
    c_br = float(ncc.ncc_score(p, q))
    c_rf = float(ncc.ncc_score(q, p))  # symmetric here
    got = float(ncc.patch_correlation_score(p, q, p, t, t, t, (2, 3)))
    want = max(0.0, (c_br * 4 + c_rf * 9) / 13)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # invalid ref -> -1
    assert float(ncc.patch_correlation_score(p, q, p, t, f, t, (2, 3))) == -1.0
    # invalid back -> only forward counts
    got2 = float(ncc.patch_correlation_score(p, q, p, f, t, t, (2, 3)))
    np.testing.assert_allclose(got2, max(0.0, c_rf), rtol=1e-6)


def test_ncc_surface_fft_peak_at_shift(rng):
    """Correlating a patch with a circularly shifted copy peaks at the
    shift (fftshift-centered)."""
    base = rng.normal(size=(16, 16))
    base -= base.mean()
    shift = (3, -2)  # (dy, dx)
    shifted = np.roll(base, shift, axis=(0, 1))
    surf = np.asarray(
        ncc.ncc_surface_fft(jnp.asarray(base[None]), jnp.asarray(shifted[None]))
    )
    peak = np.unravel_index(surf.argmax(), surf.shape)
    assert peak == (8 + shift[0], 8 + shift[1])
    off, val = ncc.peak_subpixel(jnp.asarray(surf))
    np.testing.assert_allclose(np.asarray(off), [shift[1], shift[0]], atol=0.5)


def test_mosse_response_peaks_at_center(rng):
    tpl = rng.normal(size=(1, 16, 16))
    h = ncc.mosse_filter(jnp.asarray(tpl), gsigma=2.0, beta=0.1)
    resp = np.asarray(ncc.mosse_response(h, jnp.asarray(tpl)))
    peak = np.unravel_index(resp.argmax(), resp.shape)
    assert peak == (8, 8)  # gaussian activation target is center-anchored


def test_gauss2d_normalized():
    g = np.asarray(ncc.gauss2d(9, 1.5))
    np.testing.assert_allclose(g.sum(), 1.0, rtol=1e-6)
    assert g[4, 4] == g.max()


# ---------- flow transfer + track table ----------

def test_transfer_points_constant_flow(rng):
    flow = jnp.full((40, 60, 2), 0.0).at[..., 0].set(1.5).at[..., 1].set(-0.5)
    xy = jnp.asarray([[10.2, 20.7], [58.9, 5.0], [-1.0, 5.0], [59.5, 5.0]])
    out, valid = track.transfer_points(xy, flow)
    # (58.9, 5): ceil x = 59 < W=60 -> still valid (classoftrack.py:13)
    np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False])
    np.testing.assert_allclose(np.asarray(out)[0], [11.7, 20.2], rtol=1e-6)
    assert np.all(np.isnan(np.asarray(out)[2:]))


def test_transfer_points_bilinear_interp(rng):
    """Flow varying linearly in x -> interpolated value at fractional x."""
    H, W = 20, 30
    u = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    flow = jnp.stack([jnp.asarray(u), jnp.zeros((H, W))], axis=-1)
    out, valid = track.transfer_points(jnp.asarray([[10.25, 5.0]]), flow)
    assert bool(valid[0])
    np.testing.assert_allclose(float(out[0, 0]), 10.25 + 10.25, rtol=1e-5)


def test_track_table_lifecycle(rng):
    C, W = 16, 4
    st = track.make_track_table(C, W)
    H, Wi = 50, 50
    flow_zero = jnp.zeros((H, Wi, 2))
    corners = jnp.asarray(rng.uniform(5, 45, size=(8, 2)), jnp.float32)
    cvalid = jnp.ones(8, bool)

    st = track.advance_tracks(st, flow_zero, flow_zero, corners, cvalid)
    assert int(st.alive.sum()) == 8
    pairs, pvalid = track.point_pairs(st)
    assert int(pvalid.sum()) == 0  # age-0 tracks have no pair yet

    # advance with consistent +1px x flow
    flow_f = flow_zero.at[..., 0].set(1.0)
    flow_b = flow_zero.at[..., 0].set(-1.0)
    st = track.advance_tracks(st, flow_f, flow_b, jnp.full((8, 2), jnp.nan), jnp.zeros(8, bool))
    assert int(st.alive.sum()) == 8
    pairs, pvalid = track.point_pairs(st)
    assert int(pvalid.sum()) == 8
    p = np.asarray(pairs)[np.asarray(pvalid)]
    np.testing.assert_allclose(p[:, 1, 0] - p[:, 0, 0], 1.0, atol=1e-5)

    # inconsistent backward flow kills tracks
    flow_b_bad = flow_zero.at[..., 0].set(+3.0)
    st2 = track.advance_tracks(st, flow_f, flow_b_bad, jnp.full((8, 2), jnp.nan), jnp.zeros(8, bool))
    assert int(st2.alive.sum()) == 0

    # dead slots are recycled by new corners
    st3 = track.advance_tracks(st2, flow_f, flow_b, corners, cvalid)
    assert int(st3.alive.sum()) == 8
    assert int(st3.age.max()) == 0


# ---------- corners + LK ----------

def _scene_pair(rng, p_mag=0.015):
    scene = synthetic.make_scene(rng, wh=(160, 120), fc=(150.0, 155.0))
    p_gt = np.r_[rng.normal(size=3) * p_mag, rng.normal(size=3) * p_mag / 2]
    img_a = synthetic.render(scene, geo.se3_exp(np.zeros(6)))
    img_b = synthetic.render(scene, geo.se3_exp(p_gt))
    return scene, p_gt, img_a, img_b


def test_shi_tomasi_finds_strong_corners(rng):
    img = np.zeros((64, 64))
    img[20:, :] += 50.0   # edge
    img[20:, 30:] += 80.0  # corner at (30, 20)
    xy, valid = shi_tomasi_corners(jnp.asarray(img), max_corners=10, min_distance=3)
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 1
    d = np.linalg.norm(xy - np.array([30, 20]), axis=1)
    assert d.min() < 3.0


def test_lk_tracks_synthetic_motion(rng):
    scene, p_gt, img_a, img_b = _scene_pair(rng)
    L, psz = 3, 8
    pyr_a = build_pyramid(jnp.asarray(img_a), L, psz)
    pyr_b = build_pyramid(jnp.asarray(img_b), L, psz)
    # GT correspondence: project plane points into both views
    X = synthetic.sample_plane_points(scene, rng, 50, margin=25)
    uv_a, _ = geo.project(geo.se3_exp(np.zeros(6)), X, *scene.fc, *scene.cc)
    uv_b, _ = geo.project(geo.se3_exp(p_gt), X, *scene.fc, *scene.cc)

    got, valid = track_points_lk(pyr_a, pyr_b, jnp.asarray(uv_a), psz=psz)
    got = np.asarray(got)
    v = np.asarray(valid)
    assert v.mean() > 0.8
    err = np.linalg.norm(got[v] - uv_b[v], axis=1)
    assert np.median(err) < 0.25, np.median(err)


def test_lk_forward_backward_gate(rng):
    scene, p_gt, img_a, img_b = _scene_pair(rng)
    L, psz = 3, 8
    pyr_a = build_pyramid(jnp.asarray(img_a), L, psz)
    pyr_b = build_pyramid(jnp.asarray(img_b), L, psz)
    X = synthetic.sample_plane_points(scene, rng, 40, margin=25)
    uv_a, _ = geo.project(geo.se3_exp(np.zeros(6)), X, *scene.fc, *scene.cc)
    uv_b, _ = geo.project(geo.se3_exp(p_gt), X, *scene.fc, *scene.cc)
    got, valid = lk_forward_backward(pyr_a, pyr_b, jnp.asarray(uv_a), psz=psz)
    v = np.asarray(valid)
    assert v.mean() > 0.6
    err = np.linalg.norm(np.asarray(got)[v] - uv_b[v], axis=1)
    assert np.median(err) < 0.25


def test_ncc3_fused_kernel_matches_xla_path(rng):
    """The fused Pallas verification scorer (ops/ncc_pallas.py,
    interpret mode on CPU) must match the XLA
    extract_patches+ncc_score path bit-for-bit in its math."""
    import jax.numpy as jnp
    from invcompcamtrack_tpu.image.patch import extract_patches
    from invcompcamtrack_tpu.match.ncc import ncc_score
    from invcompcamtrack_tpu.ops.ncc_pallas import ncc3_scores

    psz, pad = 8, 8
    H, W = 96, 144
    imgs = [jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
            for _ in range(3)]
    n = 37
    uvs = [jnp.asarray(
        np.c_[rng.uniform(pad + 6, W - pad - 6, n) - pad,
              rng.uniform(pad + 6, H - pad - 6, n) - pad], jnp.float32)
        for _ in range(3)]

    cbr, crf = ncc3_scores(*imgs, *uvs, psz=psz, padding=pad,
                           interpret=True)

    pats = [extract_patches(im, uv, psz, pad, patch_norm=True)
            for im, uv in zip(imgs, uvs)]
    cbr_x = ncc_score(pats[0], pats[1])
    crf_x = ncc_score(pats[1], pats[2])
    np.testing.assert_allclose(np.asarray(cbr), np.asarray(cbr_x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(crf), np.asarray(crf_x),
                               atol=1e-6)
