import jax.numpy as jnp
import numpy as np
import pytest

from invcompcamtrack_tpu.image import patch, pyramid
from tests.oracles import image_np as ora


def _rand_img(rng, h=64, w=96):
    return rng.uniform(0, 255, size=(h, w))


def test_downsample_is_2x2_average(rng):
    img = _rand_img(rng)
    out = np.asarray(pyramid.downsample2x(jnp.asarray(img)))
    np.testing.assert_allclose(out, ora.downsample2x(img), rtol=1e-12)


def test_downsample_odd_dims_drops_trailing(rng):
    img = _rand_img(rng, 65, 97)
    out = np.asarray(pyramid.downsample2x(jnp.asarray(img)))
    assert out.shape == (32, 48)
    np.testing.assert_allclose(out, ora.downsample2x(img[:64, :96]), rtol=1e-12)


def test_gradients_central_difference(rng):
    img = _rand_img(rng, 16, 20)
    dx, dy = pyramid.central_gradients(jnp.asarray(img))
    dx_o, dy_o = ora.central_gradients(img)
    np.testing.assert_allclose(np.asarray(dx), dx_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dy), dy_o, rtol=1e-12)


def test_pyramid_shapes_and_padding(rng):
    img = _rand_img(rng, 64, 96)
    pyr = pyramid.build_pyramid(jnp.asarray(img), num_levels=3, padding=8)
    assert len(pyr) == 3
    assert pyr[0].img.shape == (64 + 16, 96 + 16)
    assert pyr[1].img.shape == (32 + 16, 48 + 16)
    assert pyr[2].img.shape == (16 + 16, 24 + 16)
    # replicate-padded image: corners equal the original corner
    np.testing.assert_allclose(float(pyr[0].img[0, 0]), img[0, 0])
    np.testing.assert_allclose(float(pyr[0].img[-1, -1]), img[-1, -1])
    # zero-padded gradients
    assert float(jnp.abs(pyr[0].dx[:8, :]).max()) == 0.0
    assert float(jnp.abs(pyr[0].dy[:, :8]).max()) == 0.0


@pytest.mark.parametrize("center", [(20.0, 17.0), (20.3, 17.8), (20.999, 17.001), (8.5, 40.25)])
def test_patch_matches_bilinear_oracle(rng, center):
    psz, pad = 8, 8
    img = _rand_img(rng, 64, 96)
    img_p = np.pad(img, pad, mode="edge")
    got = np.asarray(
        patch.extract_patches(jnp.asarray(img_p), jnp.asarray([center]), psz, pad)
    )[0]
    want = ora.extract_patch(img, center[0], center[1], psz)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_patch_integer_center_is_exact_pixels(rng):
    """At an integer center the patch must be raw pixels
    img[cy-psz/2 : cy+psz/2, cx-psz/2 : cx+psz/2]."""
    psz, pad = 8, 8
    img = _rand_img(rng, 64, 96)
    img_p = np.pad(img, pad, mode="edge")
    got = np.asarray(
        patch.extract_patches(jnp.asarray(img_p), jnp.asarray([[20.0, 30.0]]), psz, pad)
    )[0]
    np.testing.assert_allclose(got, img[26:34, 16:24], rtol=1e-12)


def test_patch_norm_subtracts_mean(rng):
    psz, pad = 8, 8
    img = _rand_img(rng)
    img_p = np.pad(img, pad, mode="edge")
    got = np.asarray(
        patch.extract_patches(
            jnp.asarray(img_p), jnp.asarray([[20.4, 30.7]]), psz, pad, patch_norm=True
        )
    )[0]
    np.testing.assert_allclose(got.mean(), 0.0, atol=1e-10)


def test_patch_grad_consistent_with_separate_extraction(rng):
    psz, pad = 8, 8
    img = _rand_img(rng)
    dx_o, dy_o = ora.central_gradients(img)
    img_p = jnp.asarray(np.pad(img, pad, mode="edge"))
    dx_p = jnp.asarray(np.pad(dx_o, pad, mode="constant"))
    dy_p = jnp.asarray(np.pad(dy_o, pad, mode="constant"))
    centers = jnp.asarray([[20.3, 30.9], [5.0, 5.0], [90.5, 60.5]])
    pi, pdx, pdy = patch.extract_patches_grad(img_p, dx_p, dy_p, centers, psz, pad)
    np.testing.assert_allclose(
        np.asarray(pi), np.asarray(patch.extract_patches(img_p, centers, psz, pad)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(pdx), np.asarray(patch.extract_patches(dx_p, centers, psz, pad)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(pdy), np.asarray(patch.extract_patches(dy_p, centers, psz, pad)),
        rtol=1e-12,
    )
    # patch_norm only affects intensity plane
    pi_n, pdx_n, _ = patch.extract_patches_grad(
        img_p, dx_p, dy_p, centers, psz, pad, patch_norm=True
    )
    np.testing.assert_allclose(np.asarray(pi_n).mean(axis=(1, 2)), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pdx_n), np.asarray(pdx), rtol=1e-12)


def test_border_patch_uses_replicated_pixels(rng):
    """A patch near the border reads replicated image pixels (the whole
    point of the padding; reference pads by psz)."""
    psz, pad = 8, 8
    img = _rand_img(rng, 32, 32)
    img_p = np.pad(img, pad, mode="edge")
    got = np.asarray(
        patch.extract_patches(jnp.asarray(img_p), jnp.asarray([[0.0, 0.0]]), psz, pad)
    )[0]
    want = ora.extract_patch(img, 0.0, 0.0, psz)  # oracle clamps = replicate
    np.testing.assert_allclose(got, want, rtol=1e-10)
