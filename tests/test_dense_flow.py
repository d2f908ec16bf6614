import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match.dense_flow import dense_flow_lk, warp_image
from invcompcamtrack_tpu.match.flow_eval import flow_epe_binned
from invcompcamtrack_tpu.match.track import transfer_points
from invcompcamtrack_tpu.vo import synthetic
from tests.oracles import geometry_np as geo


def test_warp_identity(rng):
    img = jnp.asarray(rng.uniform(0, 255, (20, 30)))
    out = warp_image(img, jnp.zeros((20, 30, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-12)


def test_warp_integer_shift(rng):
    img = jnp.asarray(rng.uniform(0, 255, (20, 30)))
    flow = jnp.zeros((20, 30, 2)).at[..., 0].set(3.0)
    out = np.asarray(warp_image(img, flow))
    np.testing.assert_allclose(out[:, :-4], np.asarray(img)[:, 3:-1], rtol=1e-12)


def _texture_image(rng, H, W):
    scene = synthetic.make_scene(rng, wh=(W, H), fc=(W / 2.0, W / 2.0))
    return synthetic.render(scene, geo.se3_exp(np.zeros(6))), scene


def test_dense_flow_constant_shift(rng):
    H, W = 96, 128
    img, scene = _texture_image(rng, H, W + 8)
    shift = 3.6
    I0 = img[:, : W]
    # I1(x) = I0(x - shift): flow from I0 to I1 is +shift? backward-warp
    # convention: flow(x) maps I0 pixel x to I1 position x+flow.
    # Take I1 as the scene sampled shifted: I1[:, i] = img[:, i + shift]
    xs = np.arange(W) + shift
    x0 = np.floor(xs).astype(int)
    f = xs - x0
    I1 = (1 - f) * img[:, x0] + f * img[:, x0 + 1]

    L, pad = 3, 8
    p0 = build_pyramid(jnp.asarray(I0), L, pad)
    p1 = build_pyramid(jnp.asarray(I1), L, pad)
    flow = np.asarray(dense_flow_lk(p0, p1, pad, iters=4))
    inner = flow[16:-16, 16:-16]
    # dense LK should recover the constant shift (sign: I1 content sits
    # at x - shift relative to I0 content => flow_x = -shift... verify
    # against the actual displacement of content)
    med = np.median(inner[..., 0])
    assert abs(abs(med) - shift) < 0.25, med
    assert abs(np.median(inner[..., 1])) < 0.2
    # majority of interior pixels within half a pixel of the median flow
    frac = np.mean(np.abs(inner[..., 0] - med) < 0.5)
    assert frac > 0.6, frac

    gt = np.zeros_like(inner)
    gt[..., 0] = med
    out = flow_epe_binned(jnp.asarray(gt), jnp.asarray(inner))
    assert float(out["all"]) < 1.0


def test_dense_flow_feeds_track_table(rng):
    """The dense flow plugs into transfer_points (the oftrack pipeline).
    Non-periodic texture (the sinusoid scene aliases under pure shifts)."""
    from scipy.ndimage import gaussian_filter

    H, W = 96, 128
    base = gaussian_filter(rng.normal(size=(H, W + 16)), 2.0) * 100 + 128
    I0 = base[:, 8: 8 + W]
    I1 = base[:, 6: 6 + W]  # I1(x) = I0(x - 2) -> flow = +2
    L, pad = 3, 8
    p0 = build_pyramid(jnp.asarray(I0), L, pad)
    p1 = build_pyramid(jnp.asarray(I1), L, pad)
    flow = dense_flow_lk(p0, p1, pad, iters=4)
    pts = jnp.asarray(rng.uniform(20, 80, size=(10, 2)), jnp.float32)
    moved, valid = transfer_points(pts, flow)
    assert bool(jnp.all(valid))
    d = np.asarray(moved - pts)
    np.testing.assert_allclose(np.median(d[:, 0]), 2.0, atol=0.3)


def test_global_shift_initializer(rng):
    """FFT cross-correlation recovers a dominant integer translation."""
    import jax.numpy as jnp
    from invcompcamtrack_tpu.match.dense_flow import global_shift
    img = rng.normal(size=(96, 128)).astype(np.float32)
    # smooth it so shifting by slicing is meaningful
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, 2.0)
    dy, dx = 7, -11
    i0 = img[20:84, 30:110]
    i1 = img[20 + dy:84 + dy, 30 + dx:110 + dx]
    s = np.asarray(global_shift(jnp.asarray(i0), jnp.asarray(i1)))
    # I1(x) = I0(x + (dy,dx)) -> flow 0->1 = -(dx,dy)
    assert abs(s[0] - (-dx)) <= 1 and abs(s[1] - (-dy)) <= 1, s


def test_dense_flow_large_translation(rng):
    """With the global initializer the usable range extends far beyond
    the pyramid LK basin (median sub-pixel at ~50 px motion)."""
    import jax.numpy as jnp
    from invcompcamtrack_tpu.image.pyramid import build_pyramid
    from invcompcamtrack_tpu.match.dense_flow import dense_flow_lk
    from invcompcamtrack_tpu.match.flow_bench import plane_gt_flow
    from invcompcamtrack_tpu.vo import synthetic
    from tests.oracles import geometry_np as geo

    wh = (320, 240)
    scene = synthetic.make_scene(rng, wh=wh, fc=(288.0, 304.0),
                                 freq_range=(0.3, 4.0))
    img0 = synthetic.render(scene, geo.se3_exp(np.zeros(6)))
    p1 = np.r_[0.55, 0.2, 0.05, 0.002, 0.003, 0.001]
    G1 = geo.se3_exp(p1)
    img1 = synthetic.render(scene, G1)
    gt = plane_gt_flow(scene, geo.se3_exp(np.zeros(6)), G1)
    pad = 16
    pyr0 = build_pyramid(jnp.asarray(img0, jnp.float32), 4, pad)
    pyr1 = build_pyramid(jnp.asarray(img1, jnp.float32), 4, pad)
    flow = np.asarray(dense_flow_lk(pyr0, pyr1, pad, iters=6, radius=4))
    err = np.linalg.norm(flow - gt, axis=-1)
    assert np.linalg.norm(gt, axis=-1).mean() > 20
    # only pixels whose GT correspondence stays in frame have data
    yy, xx = np.mgrid[0:wh[1], 0:wh[0]]
    tx, ty = xx + gt[..., 0], yy + gt[..., 1]
    valid = (tx >= 0) & (tx < wh[0]) & (ty >= 0) & (ty < wh[1])
    assert np.median(err[valid]) < 4.0, np.median(err[valid])
