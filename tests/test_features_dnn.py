import jax
import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.match.ncc import ncc_score
from invcompcamtrack_tpu.vo.features_dnn import (
    extract_feature_maps,
    feature_patch_descriptors,
    init_features,
)


def test_feature_pyramid_shapes(rng):
    mod, params = init_features(jax.random.PRNGKey(0), image_shape=(64, 96))
    img = jnp.asarray(rng.uniform(0, 255, (64, 96)), jnp.float32)
    maps = extract_feature_maps(mod, params, img)
    assert len(maps) == 3
    assert maps[0].shape == (64, 96, 32)
    assert maps[1].shape == (32, 48, 64)
    assert maps[2].shape == (16, 24, 128)


def test_feature_descriptors_discriminative(rng):
    """Descriptors at the same physical location in two noisy copies
    correlate higher than at a different location."""
    mod, params = init_features(jax.random.PRNGKey(1), image_shape=(64, 96))
    base = rng.uniform(0, 255, (64, 96))
    img_a = jnp.asarray(base + rng.normal(size=base.shape) * 2, jnp.float32)
    img_b = jnp.asarray(base + rng.normal(size=base.shape) * 2, jnp.float32)
    fa = extract_feature_maps(mod, params, img_a)[0]
    fb = extract_feature_maps(mod, params, img_b)[0]
    centers = jnp.asarray([[30.0, 30.0]])
    other = jnp.asarray([[60.0, 20.0]])
    da = feature_patch_descriptors(fa, centers)
    db_same = feature_patch_descriptors(fb, centers)
    db_other = feature_patch_descriptors(fb, other)

    def score(x, y):
        xf = x.reshape(1, -1) - x.mean()
        yf = y.reshape(1, -1) - y.mean()
        return float(ncc_score(xf[:, None, :], yf[:, None, :])[0])

    s_same = score(da, db_same)
    s_other = score(da, db_other)
    assert s_same > 0.8
    assert s_same > s_other + 0.1
