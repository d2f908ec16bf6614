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
