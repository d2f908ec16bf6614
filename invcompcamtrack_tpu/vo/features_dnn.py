"""Convolutional feature extraction for patch matching.

The reference dumps VGG19 conv activations through Theano/Lasagne as an
alternative patch descriptor for its NCC matching experiments
(reference: misc_src/run_test_get_DNNconv_representation.py — partly
pseudo-code; treated as a documented experiment).  Here the same
capability is a small flax VGG-style extractor:

- ``VGGFeatures``: stacked 3x3-conv/ReLU blocks with 2x2 max-pool
  between stages, returning the activation pyramid (one map per stage),
- weights are random by default (still useful descriptors) and can be
  loaded from a flat dict, e.g. converted VGG weights,
- feature maps drop into the existing machinery: extract patches from a
  feature channel with image.patch and score with match.ncc.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class VGGFeatures(nn.Module):
    """VGG-style truncated feature extractor.

    stage_channels: channels per stage (VGG19's first stages are
    (64, 128, 256)); ``convs_per_stage`` 3x3 convs in each.
    __call__ returns a list of per-stage feature maps, each at half the
    previous stage's resolution.
    """

    stage_channels: Sequence[int] = (32, 64, 128)
    convs_per_stage: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: (H, W) or (H, W, C) grayscale/color image, float
        if x.ndim == 2:
            x = x[..., None]
        x = x[None]  # batch of 1
        outs = []
        for s, ch in enumerate(self.stage_channels):
            for c in range(self.convs_per_stage):
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{s}_{c}")(x)
                x = nn.relu(x)
            outs.append(x[0])
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs


def init_features(key, image_shape=(64, 64), **kwargs):
    """Create (module, params) for the extractor."""
    mod = VGGFeatures(**kwargs)
    params = mod.init(key, jnp.zeros(image_shape, jnp.float32))
    return mod, params


def extract_feature_maps(mod: VGGFeatures, params, img: jnp.ndarray):
    """img: (H, W) -> list of (H_s, W_s, C_s) feature maps."""
    return mod.apply(params, img)


def feature_patch_descriptors(feat: jnp.ndarray, centers: jnp.ndarray,
                              psz: int = 8) -> jnp.ndarray:
    """Sample (N, psz, psz, C) descriptor patches from a feature map at
    sub-pixel centers (feature-space NCC matching, the reference's
    NCC-on-conv-features experiment).  Uses the same bilinear gather as
    the image path, channel by channel."""
    from invcompcamtrack_tpu.image.patch import extract_patches

    C = feat.shape[-1]
    pad = psz
    planes = []
    for c in range(C):
        plane = jnp.pad(feat[..., c], pad, mode="edge")
        planes.append(extract_patches(plane, centers, psz, pad))
    return jnp.stack(planes, axis=-1)
